package graft

import java.nio.charset.StandardCharsets

/** Deterministic corpus generator for the REFBENCH head-to-head
  * (REFBENCH.md "Setup") — committed so the comparison is
  * reproducible end-to-end, not an ad-hoc artifact.
  *
  * `runMain graft.RefCorpus [sfDir] [outDir] [nFiles] [nCopies]`
  *
  * The corpus is derived from the graft test tables: the `documents`
  * text stream (all docs in doc_id order, newline-joined), replicated
  * into `nFiles` files of `nCopies` copies each. Copy 0 of every file
  * carries a unique mutation tag overwritten at each 64 KiB block
  * start (`<f{file}r0o{offset}>`), so duplication is real but not
  * total and every byte is reproducible from the parquet inputs.
  * This mirrors the shape the reference's own benchmark archives have
  * (apps/dedup consumes folders of large redundant files).
  */
object RefCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/refbench/corpus"
    val nFiles = if (args.length > 2) args(2).toInt else 80
    val nCopies = if (args.length > 3) args(3).toInt else 6
    val spark = Sessions.contractLocal("graft-refcorpus")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // driver-local by design: this manufactures a few-hundred-MB bench
    // input, it is not a scale path
    val stream = Tables.documents(spark, sfDir)
      .orderBy("doc_id").select("text").as[String]
      .collect().mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8)
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    var total = 0L
    for (f <- 0 until nFiles) {
      val out = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(dir.resolve(f"file$f%03d.bin")), 1 << 20)
      for (r <- 0 until nCopies) {
        if (r == 0) {
          val copy = stream.clone()
          var o = 0
          while (o < copy.length) {
            val tag = s"<f${f}r0o$o>".getBytes(StandardCharsets.UTF_8)
            System.arraycopy(tag, 0, copy, o, math.min(tag.length, copy.length - o))
            o += 65536
          }
          out.write(copy)
        } else out.write(stream)
      }
      out.close()
      total += stream.length.toLong * nCopies
    }
    println(s"""{"harness":"ref_corpus","out_dir":"$outDir","n_files":$nFiles,"n_copies":$nCopies,"stream_bytes":${stream.length},"total_bytes":$total}""")
    spark.stop()
  }
}
