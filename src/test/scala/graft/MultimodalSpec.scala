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
}
