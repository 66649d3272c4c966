#!/bin/bash
# Build the reference ferret toolchain (ferret-pthreads, cass_img_extract,
# and a db-construction driver) from the VENDORED sources at
# /root/reference/apps/ferret/src — entirely out-of-tree (the reference
# checkout is read-only). Produces $BUILD/bin/{ferret-pthreads,
# cass_img_extract,mkdb}.
#
# Why a build is needed at all: the shipped apps/ferret/bin/ferret-pthreads
# dynamically links libgsl.so.19 / libgslcblas.so.0 / libjpeg.so.8, none of
# which are installable in a zero-egress sandbox — but the tree VENDORS the
# full gsl 1.9 and libjpeg v7 sources with their configure scripts, so the
# whole dependency closure builds locally.
#
# Three gaps in the vendored tree are bridged WITHOUT touching it:
#  1. upl/ is empty (the UPL hardware-counter lib was never vendored) —
#     a 3-function stub (getNumOfCores/getProcMemUsage/getCommandResult,
#     the only UPL symbols ferret-pthreads.c references) is generated here.
#  2. include/cass_file.h stubs every cass_write_* with assert(0) (the
#     BenSP fork stripped the db-creation path — it only ever READS a
#     prebuilt database). An override header restoring little-endian
#     fwrite bodies is generated into an include dir that shadows the
#     original, re-enabling checkpointing for db construction.
#  3. image/extract.c disables image_extract() behind "#if 0" ("not
#     needed for ferret benchmark") while image/cass_img_extract.c still
#     calls it — a shim recomposes it from the tree's public image.h
#     entry points (image_read_rgb_hsv + image_segment +
#     image_extract_helper).
#
# The mkdb driver replays benchmark/mkdb's tool sequence (cass_init, add
# dists, cfg "2 float 14", indirect map, raw table, lsh index, import,
# checkpoint) against the libcass API, since the cass_* tool binaries the
# script invokes are absent from the checkout.
set -e
SRC=${FERRET_SRC:-/root/reference/apps/ferret/src}
B=${BUILD:-/tmp/ferretbuild}
mkdir -p "$B"/{obj,lib,bin,include,gslbuild,gslinst,jpegbuild,jpeginst}

# --- [1/6] vendored gsl 1.9, static ---------------------------------------
if [ ! -f "$B/gslinst/lib/libgsl.a" ]; then
  (cd "$B/gslbuild" && "$SRC/gsl/configure" --prefix="$B/gslinst" \
     --disable-shared --enable-static \
     CFLAGS="-O2 -g -fcommon -Wno-implicit-function-declaration" \
     > configure.log 2>&1 && make -j"$(nproc)" > make.log 2>&1 \
     && make install > install.log 2>&1)
fi

# --- [2/6] vendored libjpeg v7, static ------------------------------------
if [ ! -f "$B/jpeginst/lib/libjpeg.a" ]; then
  (cd "$B/jpegbuild" && "$SRC/libjpeg/configure" --prefix="$B/jpeginst" \
     --disable-shared --enable-static CFLAGS="-O2 -g -fcommon" \
     > configure.log 2>&1 && make -j"$(nproc)" > make.log 2>&1 \
     && make install > install.log 2>&1)
fi

# --- [3/6] UPL stub (gap 1) -----------------------------------------------
cat > "$B/upl_stub.c" <<'EOF'
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
int UPL_getNumOfCores(void) { return (int) sysconf(_SC_NPROCESSORS_ONLN); }
long UPL_getProcMemUsage(void) {
  FILE *f = fopen("/proc/self/status", "r");
  char line[256]; long kb = 0;
  if (!f) return 0;
  while (fgets(line, sizeof(line), f))
    if (strncmp(line, "VmRSS:", 6) == 0) { sscanf(line + 6, "%ld", &kb); break; }
  fclose(f); return kb;
}
char *UPL_getCommandResult(const char *cmd) {
  FILE *p = popen(cmd, "r");
  size_t cap = 4096, len = 0;
  char *buf = (char *) malloc(cap);
  if (!p) { if (buf) buf[0] = 0; return buf; }
  while (buf && len + 1024 < cap) {
    size_t n = fread(buf + len, 1, 1024, p);
    len += n; if (n < 1024) break;
  }
  if (buf) buf[len] = 0;
  pclose(p); return buf;
}
EOF
cat > "$B/upl.h" <<'EOF'
#ifndef UPL_STUB_H
#define UPL_STUB_H
#ifdef __cplusplus
extern "C" {
#endif
int UPL_getNumOfCores(void);
long UPL_getProcMemUsage(void);
char *UPL_getCommandResult(const char *cmd);
#ifdef __cplusplus
}
#endif
#endif
EOF

# --- [4/6] cass_file.h override (gap 2) -----------------------------------
python3 - "$SRC" "$B" <<'EOF'
import sys
src_dir, b = sys.argv[1], sys.argv[2]
src = open(f"{src_dir}/include/cass_file.h").read()
for ty, name in [("int32_t", "int32"), ("uint32_t", "uint32"), ("float", "float")]:
    stub = ("static inline int cass_write_%s (%s *buf, size_t nmemb, CASS_FILE *out) {\n"
            "    assert(0);\n    return -1;\n}") % (name, ty)
    impl = ("static inline int cass_write_%s (%s *buf, size_t nmemb, CASS_FILE *out) {\n"
            "    if (!isLittleEndian()) { assert(0); }\n"
            "    return fwrite(buf, sizeof(%s), nmemb, out);\n}") % (name, ty, ty)
    assert stub in src, name
    src = src.replace(stub, impl)
open(f"{b}/include/cass_file.h", "w").write(src)
EOF

# --- [5/6] image_extract shim (gap 3) -------------------------------------
cat > "$B/img_extract_shim.c" <<'EOF'
/* Recompose the "#if 0"-disabled image_extract (extract.c:358) from the
   tree's merged reader image_read_rgb_hsv (image.c:314). */
#include <stdlib.h>
#include <cass.h>
#include "image.h"
int image_read_rgb_hsv(const char *filename, int *width, int *height,
                       unsigned char **data_rgb, unsigned char **data_hsv);
int image_extract(const char *fname, cass_dataset_t *ds) {
  unsigned char *HSV, *RGB, *mask;
  int width, height, nrgn;
  image_read_rgb_hsv(fname, &width, &height, &RGB, &HSV);
  image_segment(&mask, &nrgn, RGB, width, height);
  image_extract_helper(HSV, mask, width, height, nrgn, ds);
  free(HSV); free(RGB); free(mask);
  return 0;
}
EOF

# --- [6/6] mkdb driver (replays benchmark/mkdb against the libcass API) ---
cat > "$B/mkdb.c" <<'EOF'
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/stat.h>
#include <cass.h>

static void add_vec_dist(cass_env_t *env, const char *cls, const char *name) {
  int32_t i = cass_vec_dist_class_lookup(cls);
  if (i < 0) { fprintf(stderr, "no vec dist class %s\n", cls); exit(1); }
  cass_vec_dist_class_t *c = cass_vec_dist_class_get(i);
  cass_vec_dist_t *inst = NULL;
  c->construct((void **) &inst, "");
  inst->name = strdup(name);
  cass_reg_add(&env->vec_dist, inst->name, inst);
}

static void add_vecset_dist(cass_env_t *env, const char *cls, const char *name) {
  int32_t i = cass_vecset_dist_class_lookup(cls);
  if (i < 0) { fprintf(stderr, "no vecset dist class %s\n", cls); exit(1); }
  cass_vecset_dist_class_t *c = cass_vecset_dist_class_get(i);
  cass_vecset_dist_t *inst = NULL;
  c->construct((void **) &inst, "");
  inst->name = strdup(name);
  cass_reg_add(&env->vecset_dist, inst->name, inst);
}

int main(int argc, char *argv[]) {
  if (argc != 4) {
    fprintf(stderr, "usage: %s <base_dir> <vec_file> <lsh_param>\n", argv[0]);
    return 1;
  }
  char *base = argv[1], *vecfile = argv[2], *lsh_param = argv[3];
  mkdir(base, 0755);

  cass_env_t *env = NULL;
  cass_init();
  int ret = cass_env_open(&env, base, 0);
  if (ret != 0) { printf("env_open: %s\n", cass_strerror(ret)); return 1; }

  add_vec_dist(env, "trivial", "trivial");
  add_vec_dist(env, "hamming", "hamming");
  add_vec_dist(env, "L1_float", "L1_float");
  add_vec_dist(env, "L2_float", "L2_float");
  add_vec_dist(env, "cosine", "cosine");
  add_vecset_dist(env, "trivial", "trivial");
  add_vecset_dist(env, "single", "single");
  add_vecset_dist(env, "myemd", "myemd");
  add_vecset_dist(env, "emd", "emd");

  /* cfg_corel 2 float 14 (mkdb: vecset type 2 = multi-vector set) */
  cass_vecset_cfg_t *cfg = calloc(1, sizeof(cass_vecset_cfg_t));
  cfg->refcnt = 1;
  cfg->name = strdup("cfg_corel");
  cfg->vecset_type = CASS_VECSET_SET;
  cfg->vec_type = CASS_VEC_FLOAT;
  cfg->vec_dim = 14;
  cfg->vec_size = cass_vec_dim2size(CASS_VEC_FLOAT, 14);
  cfg->flag = 0;
  cass_reg_add(&env->cfg, cfg->name, cfg);
  int32_t cfg_id = cass_reg_lookup(&env->cfg, "cfg_corel");

  cass_map_t *map = NULL;
  ret = cass_map_create(&map, env, "map_corel", 0); /* indirect */
  if (ret != 0) { printf("map_create: %s\n", cass_strerror(ret)); return 1; }
  cass_reg_add(&env->map, map->name, map);
  int32_t map_id = cass_reg_lookup(&env->map, "map_corel");

  int32_t raw_opr = cass_table_opr_lookup("raw");
  cass_table_t *tbl = NULL;
  ret = cass_table_create(&tbl, env, "corel", raw_opr, cfg_id, -1, -1, map_id, "");
  if (ret != 0) { printf("table_create: %s\n", cass_strerror(ret)); return 1; }
  cass_reg_add(&env->table, tbl->name, tbl);
  int32_t tbl_id = cass_reg_lookup(&env->table, "corel");
  cass_table_load(tbl); /* empty dataset: raw_load short-circuits, sets loaded */

  int32_t lsh_opr = cass_table_opr_lookup("lsh");
  cass_table_t *idx = NULL;
  ret = cass_table_create(&idx, env, "lsh", lsh_opr, -1, tbl_id, cfg_id, -1, lsh_param);
  if (ret != 0) { printf("index_create: %s\n", cass_strerror(ret)); return 1; }
  cass_reg_add(&env->table, idx->name, idx);
  int32_t idx_id = cass_reg_lookup(&env->table, "lsh");
  cass_table_associate(tbl, idx_id);
  cass_table_load(idx); /* count==0: LSH_load allocates fresh hash tables */

  ret = cass_table_import_data(tbl, vecfile); /* cascades into the index */
  if (ret != 0) { printf("import: %s\n", cass_strerror(ret)); return 1; }
  idx->dirty = 1;

  ret = cass_env_checkpoint(env);
  if (ret != 0) { printf("checkpoint: %s\n", cass_strerror(ret)); return 1; }
  struct raw_private *priv = (struct raw_private *) tbl->__private;
  printf("mkdb ok: %lu vecsets, %lu vecs\n",
         (unsigned long) priv->dataset.num_vecset,
         (unsigned long) priv->dataset.num_vec);
  return cass_env_close(env, 0);
}
EOF

# --- compile + link --------------------------------------------------------
# -DHUGE: removed from modern glibc math.h (SVID float max); the LSH code
# uses it as the topk sentinel (LSH_query.c:200).
CFLAGS="-Os -g -funroll-loops -fcommon -D_GNU_SOURCE -DHUGE=3.40282347e+38F \
 -Wno-implicit-function-declaration -Wno-implicit-int -Wno-incompatible-pointer-types \
 -I$B/include -I$SRC/include -I$SRC/image -I$B/gslinst/include -I$B/jpeginst/include -I$B"
rm -f "$B"/obj/*.o "$B"/lib/libcass.a "$B"/lib/libcassimage.a "$B"/cass_warn.log
gcc -O2 -c "$B/upl_stub.c" -o "$B/obj/upl_stub.o"
ar rcs "$B/lib/libupl.a" "$B/obj/upl_stub.o"
for f in "$SRC"/src/*.c "$SRC"/src/lsh/*.c; do
  gcc $CFLAGS -c "$f" -o "$B/obj/$(basename "$f" .c).o" 2>> "$B/cass_warn.log"
done
find "$B/obj" -name '*.o' ! -name 'img_*' ! -name 'upl_stub.o' -print0 \
  | xargs -0 ar rcs "$B/lib/libcass.a"
for f in image extract edge srm; do
  gcc $CFLAGS -c "$SRC/image/$f.c" -o "$B/obj/img_$f.o" 2>> "$B/cass_warn.log"
done
ar rcs "$B/lib/libcassimage.a" "$B"/obj/img_*.o
LIBS="-L$B/lib -L$B/gslinst/lib -L$B/jpeginst/lib \
 -Wl,--start-group -lcass -lcassimage -Wl,--end-group \
 -lgsl -lgslcblas -ljpeg -lupl -lrt -lm -lpthread"
gcc $CFLAGS -c "$SRC/benchmark/ferret-pthreads.c" -o "$B/obj/ferret-pthreads.o" 2>> "$B/cass_warn.log"
g++ -Os -g "$B/obj/ferret-pthreads.o" $LIBS -o "$B/bin/ferret-pthreads"
gcc $CFLAGS -c "$SRC/image/cass_img_extract.c" -o "$B/obj/cass_img_extract.o" 2>> "$B/cass_warn.log"
gcc $CFLAGS -c "$B/img_extract_shim.c" -o "$B/obj/img_extract_shim.o"
g++ -Os -g "$B/obj/cass_img_extract.o" "$B/obj/img_extract_shim.o" $LIBS -o "$B/bin/cass_img_extract"
gcc $CFLAGS -c "$B/mkdb.c" -o "$B/obj/mkdb.o"
g++ -Os -g "$B/obj/mkdb.o" $LIBS -o "$B/bin/mkdb"
echo "FERRET_BUILD_OK: $B/bin/{ferret-pthreads,cass_img_extract,mkdb}"
