package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once derived-layout cache under the JVM temp dir — the shared
  * mechanism behind the persisted MinHash index
  * ([[graft.operators.Dedup.minhashIndexCache]]), the IVF-partitioned
  * vector layout ([[graft.operators.Similarity.ivfLayoutCache]]), and the
  * day-partitioned events copy
  * ([[graft.operators.Prep.dayPartitionedEventsCache]]).
  *
  * The cache key is a CONTENT fingerprint, not just the source path: a
  * digest over the source's recursive file listing (name, length,
  * modification time) plus a caller-supplied scheme tag (parameters + a
  * version constant). Regenerating the data under the same path, or
  * changing the signature scheme, therefore changes the key and forces a
  * rebuild — a stale index silently matched against fresh data is the one
  * failure mode a derived-layout cache must make impossible (a dedup index
  * that misses duplicates gives no error, just quietly worse data).
  * Listing-digest cost is O(files) driver-side metadata calls — no data
  * scan, same order of work as the `_SUCCESS` probe itself.
  */
object LayoutCache {

  /** 12-hex digest of `scheme` + the recursive file listing under `src`
    * (each file contributes its path RELATIVE to `src`, byte length, and
    * mtime; directories recurse in sorted order). The relative path — not
    * just the base name — must enter the digest: for a hive-partitioned
    * source the partition VALUES live in directory names (`day=2024-01-02/
    * part-0.parquet`), so a partition-directory rename changes every row
    * while leaving each file's name/length/mtime untouched. Digesting
    * names only would serve a stale layout for exactly that edit.
    */
  def contentKey(spark: SparkSession, src: String, scheme: String): String = {
    val p  = new Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$scheme#$src".getBytes("UTF-8"))
    def add(path: Path, rel: String): Unit = {
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path)
          .sortBy(_.getPath.getName)
          .foreach(c => add(c.getPath, s"$rel/${c.getPath.getName}"))
      else md.update(s"$rel#${st.getLen}#${st.getModificationTime}".getBytes("UTF-8"))
    }
    add(p, "")
    md.digest().map("%02x".format(_)).mkString.take(12)
  }

  /** Return `<tmpdir>/<prefix>_<key>`, running `build` first iff the
    * layout's `_SUCCESS` guard is absent. `markSuccess = false` is for
    * builds whose Spark write commits `_SUCCESS` at the layout root itself;
    * multi-output builds keep the default and get the marker only after
    * every write committed (a half-built layout is retried, never reused).
    */
  def getOrBuild(spark: SparkSession, prefix: String, key: String, markSuccess: Boolean = true)(
      build: String => Unit
  ): String = {
    val out     = new Path(sys.props("java.io.tmpdir"), s"${prefix}_$key")
    val fs      = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new Path(out, "_SUCCESS")
    if (!fs.exists(success)) {
      build(out.toString)
      if (markSuccess) fs.create(success).close()
    }
    out.toString
  }
}
