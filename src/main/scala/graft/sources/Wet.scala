package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WET-style raw-record codec — the CommonCrawl ingest shape: huge blobs
  * of concatenated `WARC/1.0` conversion records (header lines, an empty
  * line, then a `Content-Length`-framed UTF-8 payload). Real pipelines
  * meet this format before ANY table exists; this lane provides both
  * directions so the engine can (a) parse crawl blobs into a documents
  * table and (b) serialize a table back into the interchange format.
  *
  * Framing is BYTE-accurate (`Content-Length` counts payload bytes, not
  * characters), so multibyte UTF-8 text round-trips exactly. Malformed
  * blobs degrade safely: a record whose header is unparseable or whose
  * declared length runs past the blob ends the walk (records already
  * parsed are kept) — no exception escapes into the task, no infinite
  * loop on adversarial lengths (the round-4 WAV-codec contract).
  *
  * 100 TB shape: encode is a narrow map + one bounded groupBy per blob
  * batch; parse is a narrow flatMap over blobs (each task walks only its
  * own blobs, emitting records as it goes). Record extraction
  * parallelism = blob count, the same granularity real WET processing
  * has (one .wet.gz file per task).
  */
object Wet {

  /** One WET conversion record as a binary column: header block
    * (target URI derived from the id, language, byte-accurate
    * Content-Length), blank line, payload, trailing blank line.
    */
  def record(idCol: Column, langCol: Column, textCol: Column): Column = {
    val payload = encode(textCol, "UTF-8")
    val header = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\n" +
        "WARC-Target-URI: https://example.org/doc/"), idCol,
      lit("\r\nWARC-Language: "), langCol,
      lit("\r\nContent-Length: "), length(payload).cast("string"),
      lit("\r\n\r\n"))
    concat(encode(header, "UTF-8"), payload, encode(lit("\r\n\r\n"), "UTF-8"))
  }

  /** Serialize a documents table into `nBlobs` WET blobs: records group
    * by `id % nBlobs` and concatenate in id order (deterministic bytes).
    * Returns (blob_id, blob binary). Blob count bounds per-group memory
    * — size it so corpus/nBlobs fits a task (the .wet.gz file-size knob);
    * at 100 TB you shard first and emit per-shard blob sets.
    */
  def toBlobs(docs: DataFrame, idCol: String, langCol: String,
              textCol: String, nBlobs: Int = 64): DataFrame = {
    require(nBlobs >= 1, "nBlobs must be >= 1")
    docs.select(
        pmod(col(idCol), lit(nBlobs)).cast("long").as("blob_id"),
        struct(col(idCol).as("k"),
          record(col(idCol), col(langCol), col(textCol)).as("r")).as("sr"))
      .groupBy(col("blob_id"))
      .agg(sort_array(collect_list(col("sr"))).as("rs"))
      .select(col("blob_id"),
        aggregate(col("rs"), lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x.getField("r"))).as("blob"))
  }

  /** Walk one blob's bytes, yielding (uri, lang, text) per well-formed
    * record; stops (keeping prior records) at the first malformed one.
    */
  private[graft] def parseWetBytes(
      blob: Array[Byte]): Iterator[(String, String, String)] = {
    val out = Seq.newBuilder[(String, String, String)]
    val sep = "\r\n\r\n".getBytes(UTF_8)
    def indexOfSep(from: Int): Int = {
      var i = from
      while (i + sep.length <= blob.length) {
        var j = 0
        while (j < sep.length && blob(i + j) == sep(j)) j += 1
        if (j == sep.length) return i
        i += 1
      }
      -1
    }
    var pos = 0
    var ok = true
    while (ok && pos < blob.length) {
      val hdrEnd = indexOfSep(pos)
      if (hdrEnd < 0) ok = false
      else {
        val lines = new String(blob, pos, hdrEnd - pos, UTF_8).split("\r\n")
        val hdrs = lines.iterator.drop(1).flatMap { l =>
          val i = l.indexOf(": ")
          if (i > 0) Some(l.substring(0, i) -> l.substring(i + 2)) else None
        }.toMap
        val clen = hdrs.get("Content-Length").flatMap(_.toIntOption)
        if (lines.isEmpty || lines(0) != "WARC/1.0" || clen.isEmpty ||
            clen.get < 0 || hdrEnd + sep.length + clen.get > blob.length) {
          ok = false
        } else {
          val start = hdrEnd + sep.length
          out += ((hdrs.getOrElse("WARC-Target-URI", ""),
            hdrs.getOrElse("WARC-Language", ""),
            new String(blob, start, clen.get, UTF_8)))
          pos = start + clen.get
          // consume the record-terminating blank block if present
          if (pos + sep.length <= blob.length && indexOfSep(pos) == pos)
            pos += sep.length
        }
      }
    }
    out.result().iterator
  }

  /** Parse WET blobs back into a (uri, lang, text) table — a narrow
    * distributed flatMap, one task per blob partition.
    */
  def parseBlobs(blobs: DataFrame, blobCol: String = "blob"): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col(blobCol)).as[Array[Byte]]
      .flatMap(parseWetBytes _)
      .toDF("uri", "lang", "text")
  }

  /** uri → the numeric doc id [[record]] embedded (null if absent). */
  def docIdFromUri(uriCol: Column): Column =
    nullif(regexp_extract(uriCol, "/doc/(\\d+)$", 1), lit(""))
      .cast("long")
}
