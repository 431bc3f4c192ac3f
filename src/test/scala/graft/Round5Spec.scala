package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-5 hardening specs, from the round-4 ADVICE findings: malformed
  * WAV payloads must decode to None (not hang or throw inside a task),
  * streaming funnels must keep a null user id distinct from the string
  * "null" and skip null event times, the table-join kernels must resolve
  * the right side's event-time column when it is also a join key, and the
  * chunkers must not silently drop null-text rows.
  */
class Round5Spec extends SparkSpecBase {

  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // ---- ADVICE #1: decodeWav rejects malformed chunk walks ----

  private def riffHeader(totalLen: Int): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.allocate(totalLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(totalLen - 8)
      .put("WAVE".getBytes("US-ASCII"))
    bb
  }

  test("decodeWav: negative chunk size returns None instead of looping") {
    // chunk size -8 makes the old walk advance by 0 bytes -> infinite loop
    val bb = riffHeader(64)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(-8)
    val media = Seq((1L, bb.array())).toDF("media_id", "payload")
    assert(graft.ext.Multimodal.decodeAudio(media).count() == 0L)
  }

  test("decodeWav: fmt chunk size past end of buffer returns None") {
    // claims a 100-byte fmt chunk in a 44-byte payload: the old code read
    // le16 past the array end (ArrayIndexOutOfBounds inside a task)
    val bb = riffHeader(44)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(100)
    val media = Seq((2L, bb.array())).toDF("media_id", "payload")
    assert(graft.ext.Multimodal.decodeAudio(media).count() == 0L)
  }

  test("decodeWav: negative data size returns None") {
    val bb = riffHeader(72)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(-4)
    val media = Seq((3L, bb.array())).toDF("media_id", "payload")
    assert(graft.ext.Multimodal.decodeAudio(media).count() == 0L)
  }

  test("decodeWav: well-formed payload still decodes after the hardening") {
    val n = 16
    val bb = riffHeader(44 + n * 2)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    (0 until n).foreach(i => bb.putShort(i.toShort))
    val media = Seq((4L, bb.array())).toDF("media_id", "payload")
    val got = graft.ext.Multimodal.decodeAudio(media).collect()
    assert(got.length == 1 && got.head.getLong(3) == n.toLong)
  }

  // ---- ADVICE #2/#3: funnel null user id and null event time ----

  test("windowFunnelStream: null user id stays distinct from \"null\"") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ms = MemoryStream[(String, java.sql.Timestamp, String)]
    val out = graft.ext.Funnel.windowFunnelStream(
      ms.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("A", "B"), withinSeconds = 100L)
    val q = out.writeStream.format("memory").queryName("funnel_null_user")
      .outputMode("append").start()
    try {
      // a null-id user and a user literally named "null", interleaved;
      // String.valueOf keying merged them into one funnel state
      ms.addData((null, ts(0), "A"), ("null", ts(1), "A"))
      q.processAllAvailable()
      ms.addData((null, ts(2), "B"), ("null", ts(3), "B"))
      q.processAllAvailable()
      val depth2 = spark.table("funnel_null_user").collect()
        .filter(_.getLong(1) == 2L).map(_.getString(0))
      assert(depth2.length == 2, s"want two depth-2 users, got ${depth2.mkString(",")}")
      assert(depth2.contains(null) && depth2.contains("null"))
    } finally q.stop()
  }

  test("windowFunnelStream: null event-time rows are skipped, not fatal") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ms = MemoryStream[(String, java.sql.Timestamp, String)]
    val out = graft.ext.Funnel.windowFunnelStream(
      ms.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("A", "B"), withinSeconds = 100L)
    val q = out.writeStream.format("memory").queryName("funnel_null_ts")
      .outputMode("append").start()
    try {
      // the null-ts B must not advance u1's funnel or kill the query
      ms.addData(("u1", ts(0), "A"), ("u1", null, "B"))
      q.processAllAvailable()
      val rows = spark.table("funnel_null_ts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("u1", 1L)), s"got $rows")
    } finally q.stop()
  }

  // ---- ADVICE #4: right event-time column that is also a join key ----

  test("streamTableJoin: table's event time doubling as its join key resolves") {
    import graft.compile.KFrame
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val sms = MemoryStream[(java.sql.Timestamp, java.sql.Timestamp, Long)]
    val tms = MemoryStream[(java.sql.Timestamp, String)]
    val sf = KFrame(sms.toDF().toDF("k", "sts", "v"),
      keys = Seq("k"), eventTime = Some("sts"))
    // the table is keyed BY its event-time column: the old rTsName lookup
    // asked for "rts_r" after the key rename had produced "k" -> unresolved
    val rf = KFrame(tms.toDF().toDF("rts", "name"),
      keys = Seq("rts"), eventTime = Some("rts"), isTable = true)
    val out = graft.state.TableKernels.streamTableJoin(
      sf, rf, "left", retention = Some("1 hour"))
    val q = out.writeStream.format("memory").queryName("stj_ts_key")
      .outputMode("append").start()
    try {
      tms.addData((ts(100), "dim-100"))
      q.processAllAvailable()
      sms.addData((ts(100), ts(101), 7L))
      q.processAllAvailable()
      val got = spark.table("stj_ts_key").collect()
        .map(r => (r.getAs[Long]("v"), r.getAs[String]("name"))).toSet
      assert(got == Set((7L, "dim-100")), s"got $got")
    } finally q.stop()
  }

  test("tableTableJoin: right event time as join key resolves (batch-free kernel check)") {
    import graft.compile.KFrame
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val lms = MemoryStream[(java.sql.Timestamp, java.sql.Timestamp, Long)]
    val rms = MemoryStream[(java.sql.Timestamp, String)]
    val lf = KFrame(lms.toDF().toDF("k", "lts", "lv"),
      keys = Seq("k"), eventTime = Some("lts"), isTable = true)
    val rf = KFrame(rms.toDF().toDF("rts", "name"),
      keys = Seq("rts"), eventTime = Some("rts"), isTable = true)
    val out = graft.state.TableKernels.tableTableJoin(
      lf, rf, "inner", retention = Some("1 hour"))
    val q = out.writeStream.format("memory").queryName("ttj_ts_key")
      .outputMode("append").start()
    try {
      lms.addData((ts(100), ts(50), 1L))
      rms.addData((ts(100), "r-100"))
      q.processAllAvailable()
      val got = spark.table("ttj_ts_key").collect()
        .map(r => (r.getAs[Long]("lv"), r.getAs[String]("name"))).toSet
      assert(got == Set((1L, "r-100")), s"got $got")
    } finally q.stop()
  }

  // ---- real JPEG/PNG lane via javax.imageio ----

  test("imageStats: real PNG decode recovers exact dims and fill color") {
    val docs = Seq(5L, 37L, 254L).toDF("doc_id")
    val got = graft.ext.Multimodal.imageStats(
        graft.ext.Multimodal.synthesizeImages(docs, "png"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3),
         r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    for (id <- Seq(5L, 37L, 254L)) {
      val want = ((id % 30).toInt + 2, (id % 19).toInt + 2, 3,
        ((id * 7) % 256).toInt, ((id * 13) % 256).toInt,
        ((id * 29) % 256).toInt)
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
    }
  }

  test("decode: JPEG/PNG/BMP payloads route to the real ImageIO lane") {
    import graft.ext.Multimodal
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val media = Seq(
      (1L, Multimodal.encodeImage(img, "jpeg")),
      (2L, Multimodal.encodeImage(img, "png")),
      (3L, Multimodal.encodeImage(img, "bmp")),
      (4L, "plain text payload".getBytes("UTF-8"))) // stub lane
      .toDF("media_id", "payload")
    val metas = Multimodal.decode(media)
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(metas(id) == (17, 9), s"id=$id got=${metas(id)}")
    // the text payload keeps the deterministic stub's length-derived shape
    assert(metas(4L) == (19, 1))
  }

  test("transcodeImage: decode→resize→re-encode→decode round-trip") {
    import graft.ext.Multimodal
    val img = new java.awt.image.BufferedImage(
      100, 50, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until 50).foreach(y => (0 until 100).foreach(x =>
      img.setRGB(x, y, 0x336699)))
    val media = Seq(
      (1L, Multimodal.encodeImage(img, "png")),
      (2L, Multimodal.encodeImage(img, "jpeg")),
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.imageStats(Multimodal.transcodeImage(media, 10))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    // 100x50 fit into 10 -> 10x5; both formats re-encode decodably
    assert(out(1L) == (10, 5, 3), s"png: ${out(1L)}")
    assert(out(2L) == (10, 5, 3), s"jpeg: ${out(2L)}")
    assert(!out.contains(3L), "non-image rows pass through, not decodable")
    // small targets never upscale
    val noUp = Multimodal.imageStats(Multimodal.transcodeImage(media, 500))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(noUp(1L) == (100, 50))
  }

  // ---- ADVICE #5: chunkers keep null-text rows ----

  test("chunkByChars/chunkByWords: null text yields one empty chunk, id kept") {
    val docs = Seq((1L, null: String), (2L, "hello world"))
      .toDF("doc_id", "text")
    for (chunked <- Seq(
        graft.ext.Pipeline.chunkByChars(docs, chunkChars = 5, overlapChars = 1),
        graft.ext.Pipeline.chunkByWords(docs, chunkWords = 2, overlapWords = 0))) {
      val byDoc = chunked.collect().groupBy(_.getLong(0))
      assert(byDoc.contains(1L), "null-text doc id must not be dropped")
      assert(byDoc(1L).length == 1 && byDoc(1L).head.getString(2) == "",
        s"null text -> exactly one empty chunk, got ${byDoc(1L).mkString(",")}")
      assert(byDoc(2L).nonEmpty)
    }
  }
}
