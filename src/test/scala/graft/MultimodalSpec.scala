package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** The real BMP codec path: generator and parser are independent code
  * (ByteBuffer writes vs header-offset reads), so a round-trip equality is
  * a genuine check of both — plus hand-built negative/edge cases the gate
  * corpus can't produce.
  */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("bmpBytes → decodeBmp round-trips dimensions and brightness") {
    Seq(0L, 1L, 7L, 31L, 95L, 12345L).foreach { id =>
      val f = Multimodal.decodeBmp(MediaRow(id, "image", Multimodal.bmpBytes(id)))
      assert(f.width === (1 + id % 32).toInt, s"id=$id")
      assert(f.height === (1 + id % 24).toInt, s"id=$id")
      assert(f.n_frames === 1)
      val nPix = f.width * f.height * 3
      val expected = (0 until nPix).map(j => (id + j) % 256).sum.toDouble / nPix
      assert(f.brightness === expected, s"id=$id")
    }
  }

  test("resizeBmpNN: 1x1 source repeats its pixel; 8x8 source is identity") {
    // doc_id=0 → w=h=1: stored bytes (B,G,R) = 0,1,2 → every thumbnail
    // pixel must be RGB (2,1,0)
    val t1 = Multimodal.resizeBmpNN(
      MediaRow(0L, "image", Multimodal.bmpBytes(0L)), 8, 8)
    assert(t1.width === 1 && t1.height === 1)
    assert(t1.thumb_csv === Seq.fill(64)("2,1,0").mkString(","))
    // doc_id=7 → w=h=8: NN at equal size is the identity — thumbnail pixel
    // (x, y) must be the source pixel (x, y) read top-down RGB
    val id = 7L
    val t8 = Multimodal.resizeBmpNN(
      MediaRow(id, "image", Multimodal.bmpBytes(id)), 8, 8)
    assert(t8.width === 8 && t8.height === 8)
    val expected = (for {
      y <- 0 until 8; x <- 0 until 8; c <- Seq(2, 1, 0) // stored BGR → RGB
    } yield (id + (8 - 1 - y) * 24 + 3 * x + c) % 256).mkString(",")
    assert(t8.thumb_csv === expected)
    assert(t8.thumb_sum === t8.thumb_csv.split(",").map(_.toLong).sum)
  }

  test("resampleWavNN: identity at source rate; 2:1 decimation keeps even frames") {
    // doc_id=0 → 8000 Hz mono, 100 frames: resampling to 8000 is identity
    val r0 = Multimodal.resampleWavNN(
      MediaRow(0L, "audio", Multimodal.wavBytes(0L)), 8000)
    assert(r0.n_frames_out === r0.n_frames_src)
    assert(r0.samples_csv ===
      (0 until 100).map(k => (7 * k) % 201 - 100).mkString(","))
    // doc_id=5 → 16000 Hz stereo, 105 frames: target 8000 takes every
    // second frame, both channels interleaved
    val id = 5L
    val r5 = Multimodal.resampleWavNN(
      MediaRow(id, "audio", Multimodal.wavBytes(id)), 8000)
    assert(r5.src_rate === 16000 && r5.n_channels === 2)
    assert(r5.n_frames_out === r5.n_frames_src / 2)
    val expected = (for {
      t <- 0 until r5.n_frames_out; c <- 0 until 2
    } yield ((id + 7 * (2 * t * 2 + c)) % 201 - 100)).mkString(",")
    assert(r5.samples_csv === expected)
  }

  test("resampleAviNN: frame timing, channel sums, and duration preservation") {
    // doc_id=4 → w=23, h=22, nf=7, us=41666 (24 fps), cb=4, cg=4, cr=4
    val id = 4L
    val r = Multimodal.resampleAviNN(
      MediaRow(id, "video", Multimodal.aviBytes(id)), 100000)
    val (w, h, nf, _) = Multimodal.aviGeom(id)
    assert(r.us_per_frame === 41666 && r.n_frames_src === nf)
    assert(r.n_frames_out === (nf.toLong * 41666 / 100000).toInt)
    val expected = (0 until r.n_frames_out).map { t =>
      val f = (t.toLong * 100000 / 41666).toInt
      val sb = h.toLong * (w.toLong * 4 + w.toLong * (w - 1) / 2)
      val sg = w.toLong * (h.toLong * 4 + h.toLong * (h - 1))
      val sr = w.toLong * h * (4 + 5L * f)
      s"$f:$sb:$sg:$sr"
    }.mkString(",")
    assert(r.frames_csv === expected)
  }

  test("q166 banding is lossless at Hamming ≤ 3: output equals brute-force all-pairs") {
    // pigeonhole: ≤3 differing bits cannot touch all 4 bands of 16, so
    // the band-bucketed candidate join must recover EVERY qualifying
    // pair — compare against exhaustive all-pairs over the same hashes
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val hashes = Multimodal.bmpMediaTable(Tables.documents(spark, sfDir))
      .map(Multimodal.aHashBmp).collect()
      .filter(a => a.width >= 8 && a.height >= 8)
      .map(a => a.doc_id -> a.bits).sortBy(_._1)
    val brute = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      d = hashes(i)._2.zip(hashes(j)._2).count { case (x, y) => x != y }
      if d <= 3
    } yield (hashes(i)._1, hashes(j)._1, d)).toSet
    val got = SparkEntry.queries("q166_image_neardup")(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty, "corpus is known to contain near-dup images")
  }

  test("q167 audio banding is lossless at Hamming ≤ 2: output equals brute-force all-pairs") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val hashes = Multimodal.wavMediaTable(Tables.documents(spark, sfDir))
      .map(Multimodal.aHashWav).collect()
      .map(a => a.doc_id -> a.bits).sortBy(_._1)
    val brute = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      d = hashes(i)._2.zip(hashes(j)._2).count { case (x, y) => x != y }
      if d <= 2
    } yield (hashes(i)._1, hashes(j)._1, d)).toSet
    val got = SparkEntry.queries("q167_audio_neardup")(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty, "corpus is known to contain near-dup audio")
  }

  test("aHashWav is rate-invariant: the same signal at two rates fingerprints alike") {
    // resampling to the canonical 8 kHz is what buys rate invariance —
    // docs 0 and 4 differ ONLY in doc_id phase; instead test directly:
    // a doc's fingerprint equals the fingerprint of its own 8 kHz
    // resample re-wrapped as a WAV (identity under canonicalization)
    val m = Multimodal.wavMediaTable(Tables.documents(spark, sfDir))
      .collect().find(_.doc_id % 4 == 3).get // a 44.1 kHz doc
    val r = Multimodal.resampleWavNN(m, 8000)
    val samples = r.samples_csv.split(",").map(_.toInt)
    // rebuild a canonical 8 kHz WAV holding exactly those samples
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(r.n_channels.toShort)
      .putInt(8000).putInt(8000 * r.n_channels * 2)
      .putShort((r.n_channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(s => bb.putShort(s.toShort))
    val canon = MediaRow(m.doc_id, "audio", bb.array())
    assert(Multimodal.aHashWav(canon).bits === Multimodal.aHashWav(m).bits)
  }

  test("aHash is invariant under a uniform brightness shift (no wrap)") {
    // shift every pixel byte of a real generated BMP by +1 where no 255
    // wrap occurs: grays and mean move together, bits must not change
    val base = Multimodal.bmpMediaTable(Tables.documents(spark, sfDir))
      .collect().find { m =>
        val h = Multimodal.aHashBmp(m)
        h.width >= 8 && h.height >= 8 &&
          !m.payload.drop(54).exists(b => (b & 0xff) >= 255)
      }.get
    val shifted = {
      val p = base.payload.clone()
      var i = 54 // canonical header size used by the generator
      while (i < p.length) { p(i) = ((p(i) & 0xff) + 1).toByte; i += 1 }
      MediaRow(base.doc_id, base.media_type, p)
    }
    assert(Multimodal.aHashBmp(shifted).bits === Multimodal.aHashBmp(base).bits)
  }

  test("decodeBmp walks rows stride-aware (padding bytes never counted)") {
    // width 1 → rowBytes 3, stride 4: one padding byte per row. A decoder
    // that read stride-many bytes per row would dilute the mean with the
    // zero padding — id=0 makes every pixel byte j%256 = j, so the
    // expected mean is exactly (0+1+2)/3 per row pattern continued
    val id = 0L // width 1, height 1
    val f = Multimodal.decodeBmp(MediaRow(id, "image", Multimodal.bmpBytes(id)))
    assert(f.width === 1 && f.height === 1)
    assert(f.brightness === 1.0) // bytes 0,1,2 → mean 1.0; with padding it'd be 0.75
  }

  test("isBmp rejects text that merely starts with BM") {
    val fake = ("BM" + "x" * 100).getBytes("UTF-8")
    assert(!Multimodal.isBmp(fake))
    assert(Multimodal.isBmp(Multimodal.bmpBytes(42L)))
  }

  test("wavBytes → decodeWav round-trips every header field and the sample mean") {
    Seq(0L, 1L, 2L, 3L, 17L, 399L, 12345L).foreach { id =>
      val f = Multimodal.decodeWav(MediaRow(id, "audio", Multimodal.wavBytes(id)))
      assert(f.sample_rate === Array(8000, 16000, 22050, 44100)((id % 4).toInt), s"id=$id")
      assert(f.n_channels === 1 + (id % 2).toInt, s"id=$id")
      assert(f.bits_per_sample === 16)
      assert(f.n_frames === 100 + (id % 400).toInt, s"id=$id")
      assert(f.duration_ms === f.n_frames * 1000.0 / f.sample_rate, s"id=$id")
      val nSamples = f.n_frames * f.n_channels
      val expected = (0 until nSamples)
        .map(k => math.abs((id + 7L * k) % 201 - 100)).sum.toDouble / nSamples
      assert(f.mean_amp === expected, s"id=$id")
    }
  }

  test("decodeWav walks the chunk list: unknown chunks between fmt and data are skipped") {
    // splice a LIST chunk (odd size → word-aligned padding byte) between
    // the fmt and data chunks; a parser reading fixed offsets instead of
    // walking chunk sizes would misread the data chunk entirely
    val base = Multimodal.wavBytes(5L)
    val listBody = "INFOgraft".getBytes("US-ASCII") // 9 bytes, odd
    val insertAt = 12 + 24 // after fmt chunk
    val extra = 8 + listBody.length + 1 // header + body + pad
    val spliced = java.nio.ByteBuffer
      .allocate(base.length + extra).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spliced.put(base, 0, insertAt)
    spliced.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
      .put(listBody).put(0.toByte)
    spliced.put(base, insertAt, base.length - insertAt)
    val payload = spliced.array()
    // fix the RIFF size field for the sniffer's length check
    java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, payload.length - 8)
    val f = Multimodal.decodeWav(MediaRow(5L, "audio", payload))
    val plain = Multimodal.decodeWav(MediaRow(5L, "audio", base))
    assert(f === plain.copy(doc_id = 5L))
  }

  test("isWav rejects text that merely starts with RIFF") {
    val fake = ("RIFF" + "x" * 100).getBytes("UTF-8")
    assert(!Multimodal.isWav(fake))
    assert(Multimodal.isWav(Multimodal.wavBytes(42L)))
  }

  test("extractFeatures dispatches: BMP payloads real-decoded, others stubbed") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(3L, "image", Multimodal.bmpBytes(3L)),
      MediaRow(4L, "audio", "some opaque audio bytes".getBytes("UTF-8")))
    val out = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(3L).width === (1 + 3 % 32) && out(3L).n_frames === 1)
    // stub formula: width = 64 + n % 1024
    assert(out(4L).width === 64 + "some opaque audio bytes".length % 1024)
  }

  test("aviBytes → decodeAvi round-trips header fields, frame walk, and DIB pixel means") {
    for (id <- Seq(0L, 7L, 11L, 38L)) {
      val f = Multimodal.decodeAvi(MediaRow(id, "video", Multimodal.aviBytes(id)))
      val w = (7 + 4 * (id % 11)).toInt
      val h = (6 + 4 * (id % 7)).toInt
      val nf = (3 + id % 6).toInt
      val stride = ((3 * w + 3) / 4) * 4
      assert(stride > 3 * w, "width must force real stride padding")
      assert(f.width === w && f.height === h && f.n_frames === nf)
      val usPer = Seq(66666, 41666, 33333)((id % 3).toInt)
      assert(f.fps === 1000000.0 / usPer)
      assert(f.duration_ms === nf.toLong * usPer / 1000.0)
      // independent reference: replay the generator's pixel formulas
      // directly (not through the byte layout the decoder walks)
      val cb = (id % 100).toInt; val cg = (id % 50).toInt; val cr = (id % 20).toInt
      val px = for (fr <- 0 until nf; y <- 0 until h; x <- 0 until w)
        yield (cr + 5 * fr, cg + 2 * y, cb + x)
      val n = px.size
      assert(f.mean_r === px.map(_._1.toLong).sum.toDouble / n)
      assert(f.mean_g === px.map(_._2.toLong).sum.toDouble / n)
      assert(f.mean_b === px.map(_._3.toLong).sum.toDouble / n)
      // mean over ALL chunk bytes includes the zero stride padding
      val total = px.map(t => (t._1 + t._2 + t._3).toLong).sum
      assert(f.mean_frame_byte === total.toDouble / (stride.toLong * h * nf))
    }
  }

  test("decodeAvi reports NaN channel means for a non-DIB stream (metadata stays real)") {
    val base = Multimodal.aviBytes(5L)
    // flip biCompression (strf offset 16) to a non-BI_RGB codec tag: the
    // pixel walk must disarm rather than misread compressed bytes
    // RIFF(12) + LIST-hdrl hdr(12) + avih(64) + LIST-strl hdr(12) +
    // strh(64) + strf hdr(8) = 172 = offset of the BITMAPINFOHEADER
    val strfData = 12 + 12 + (8 + 56) + 12 + (8 + 56) + 8
    java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(strfData + 16, 0x44495658) // 'XVID'
    val f = Multimodal.decodeAvi(MediaRow(5L, "video", base))
    assert(f.n_frames === (3 + 5 % 6) && f.width === (7 + 4 * (5 % 11)))
    assert(f.mean_r.isNaN && f.mean_g.isNaN && f.mean_b.isNaN)
  }

  test("decodeAvi skips unknown chunks and rejects a header/movi frame-count desync") {
    val base = Multimodal.aviBytes(7L)
    // splice an unknown 'JUNK' chunk between hdrl and movi — spec-legal
    val junkBody = "notaframe".getBytes("US-ASCII") // 9 bytes, odd → pad
    val insertAt = 12 + 200 // after LIST hdrl (8 + 192)
    val extra = 8 + junkBody.length + 1
    val spliced = java.nio.ByteBuffer
      .allocate(base.length + extra).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spliced.put(base, 0, insertAt)
    spliced.put("JUNK".getBytes("US-ASCII")).putInt(junkBody.length)
      .put(junkBody).put(0.toByte)
    spliced.put(base, insertAt, base.length - insertAt)
    val payload = spliced.array()
    java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, payload.length - 8)
    val f = Multimodal.decodeAvi(MediaRow(7L, "video", payload))
    assert(f === Multimodal.decodeAvi(MediaRow(7L, "video", base)))
    // truncate one movi frame (8-byte chunk header + DIB payload) without
    // fixing avih.dwTotalFrames: the header/movi cross-check must fail loudly
    val w7 = 7 + 4 * (7 % 11); val h7 = 6 + 4 * (7 % 7)
    val chunk = 8 + ((3 * w7 + 3) / 4) * 4 * h7
    val truncated = base.dropRight(chunk)
    java.nio.ByteBuffer.wrap(truncated).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, truncated.length - 8)
    // fix the movi LIST size so the walk itself is well-formed
    val moviListOff = 12 + 200 // LIST movi header position in base
    java.nio.ByteBuffer.wrap(truncated).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(moviListOff + 4,
        java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .getInt(moviListOff + 4) - chunk)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeAvi(MediaRow(7L, "video", truncated))
    }
    assert(e.getMessage.contains("frames"))
  }

  test("q209 VAD: the planted silence/speech alternation is recovered — " +
    "short payloads are all-silence, long ones mix both") {
    // ids 0..63 are the short regime (nf = 100+id ≤ 163 — at most a
    // sliver past the first silent gate block); 240..303 are long
    // (nf ≥ 340 — full voiced blocks present)
    val rows = ((0L until 64L) ++ (240L until 304L)).map { id =>
      id -> Multimodal.vadSegments(MediaRow(id, "audio",
        Multimodal.wavVadBytes(id)))
    }
    rows.foreach { case (id, v) =>
      val nf = 100 + (id % 400).toInt
      assert(v.n_active <= v.n_frames_vad)
      assert(v.longest_run <= v.n_active)
      assert((v.n_segments == 0) === (v.n_active == 0))
      // gate blocks are 160 SOURCE frames, block 0 silent: a payload
      // that never reaches source frame 160 must be pure silence
      if (nf <= 160) {
        assert(v.speech_ppm === 0L, s"doc $id: short payload not silent")
      }
      // one that covers a full voiced block (frames 160..320) must have
      // speech, and can never be all-speech (block 0 is silent)
      if (nf >= 340) {
        assert(v.n_segments >= 1, s"doc $id: voiced block missed")
        assert(v.speech_ppm > 0L && v.speech_ppm < 1000000L)
      }
    }
    // the fixture must exercise both regimes
    assert(rows.exists(_._2.speech_ppm == 0L))
    assert(rows.exists(r => r._2.speech_ppm > 0L))
    // the VAD fixture still parses as a genuine WAV through the strict
    // chunk-walking decoder (same container discipline as wavBytes)
    rows.take(4).foreach { case (id, _) =>
      val f = Multimodal.decodeWav(MediaRow(id, "audio",
        Multimodal.wavVadBytes(id)))
      assert(f.sample_rate > 0)
    }
  }

  test("q243: the steady fixture yields zero cuts, and the detector fires " +
    "on planted jump sequences") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = SparkEntry.queries("q243_scene_cuts")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cuts") === 0L,
        s"doc ${r.getAs[Long]("doc_id")}: steady clip reported a cut")
      // constant diffs: max diff * n_pairs == total
      assert(r.getAs[Long]("max_diff") * r.getAs[Long]("n_pairs") ===
        r.getAs[Long]("total_diff"))
    }
    // planted: steady run, one hard jump, steady run — exactly one cut
    val planted = Seq(
      (1L, Seq(100L, 110L, 120L, 1000L, 1010L, 1020L)),
      (2L, Seq(50L, 50L, 50L, 50L)),         // perfectly static: no cuts
      (3L, Seq(10L, 500L)))                  // one pair: 3x mean never fires
      .toDF("doc_id", "fsums")
    val out = graft.queries.ExtensionQueries.sceneCutStats(planted)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_cuts"))
      .toMap
    assert(out(1L) === 1L, "the 880-jump must read as a cut")
    assert(out(2L) === 0L)
    assert(out(3L) === 0L, "a single pair cannot exceed 3x its own mean")
    // and frame sums from real bytes agree with decodeAvi's aggregate
    val m = Multimodal
      .aviMediaTable(Tables.documents(spark, sfDir)).limit(3).collect()
    m.foreach { row =>
      val sums = Multimodal.videoFrameSums(row)
      val agg = Multimodal.decodeAvi(row)
      assert(sums.length === agg.n_frames)
    }
  }

  test("videoFrameSums finds frames wrapped in 'rec ' record LISTs and " +
    "fails a truncated LIST through the doc-labeled require") {
    // hand-built minimal AVI: movi holds one rec-wrapped frame and one
    // direct frame — interleaved AVIs group frames in LIST('rec ')
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    def list(form: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", form.getBytes("US-ASCII") ++ inner)
    val recFrame = list("rec ", chunk("00db", Array[Byte](1, 2, 3, 4)))
    val direct = chunk("00db", Array[Byte](5, 6, 7))
    val movi = list("movi", recFrame ++ direct)
    val payload = java.nio.ByteBuffer.allocate(12 + movi.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(4 + movi.length)
      .put("AVI ".getBytes("US-ASCII")).put(movi).array()
    val sums = Multimodal.videoFrameSums(MediaRow(42L, "video", payload))
    assert(sums.toSeq === Seq(10L, 18L),
      "rec-wrapped frame missing or direct frame lost")
    // malformed: a LIST whose size (2) cannot hold its 4-byte form tag
    // must fail through the labeled require, not StringIndexOutOfBounds
    val shortList = chunk("LIST", Array[Byte](0, 0))
    val bad = java.nio.ByteBuffer.allocate(12 + shortList.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(4 + shortList.length)
      .put("AVI ".getBytes("US-ASCII")).put(shortList).array()
    val e = intercept[IllegalArgumentException] {
      Multimodal.videoFrameSums(MediaRow(43L, "video", bad))
    }
    assert(e.getMessage.contains("doc 43"), e.getMessage)
  }
}
