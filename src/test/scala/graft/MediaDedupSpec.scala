package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, Multimodal}

/** Image near-dup tier (X84): dHash kernel vs a literal per-pixel
  * re-derivation, the invariances the hash is FOR (re-encode,
  * unclamped brightness), banded-pair brute parity, and the
  * poison-row conventions. */
class MediaDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Literal re-derivation of the dhash64 contract straight from a
    * pixel function — independent of BufferedImage and the decoder. */
  private def bruteDhash(w: Int, h: Int)
      (px: (Int, Int) => (Int, Int, Int)): Long = {
    val sums = Array.ofDim[Long](8, 9)
    val counts = Array.ofDim[Long](8, 9)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      sums(y * 8 / h)(x * 9 / w) += 299L * r + 587L * g + 114L * b
      counts(y * 8 / h)(x * 9 / w) += 1
    }
    (0 until 8).flatMap(cy => (0 until 8).map(cx =>
      if (sums(cy)(cx) * counts(cy)(cx + 1) <
          sums(cy)(cx + 1) * counts(cy)(cx)) 1L << (cy * 8 + cx)
      else 0L)).reduce(_ | _)
  }

  private def seedPx(seed: Int)(x: Int, y: Int): (Int, Int, Int) =
    ((seed * 3 + x * 7 + y * 11) % 248,
     (seed * 5 + x * 11 + y * 3) % 248,
     (seed * 7 + x * 3 + y * 13) % 248)

  test("dhash64 over the real BMP decoder matches the literal " +
      "re-derivation, incl. non-divisible grid dims") {
    for ((w, h) <- Seq((18, 16), (9, 8), (23, 17), (64, 48), (10, 11));
         seed <- Seq(0, 7, 131)) {
      val bmp = Multimodal.SyntheticMedia.bmp24(w, h)(seedPx(seed))
      val got = MediaDedup.dhash64Bytes(bmp)
      assert(got != null && got.longValue ==
        bruteDhash(w, h)(seedPx(seed)), s"w=$w h=$h seed=$seed")
    }
  }

  test("re-encode and unclamped brightness are dHash-invariant; a " +
      "local edit moves few bits; sign bit round-trips") {
    val base = Multimodal.SyntheticMedia.bmp24(18, 16)(seedPx(42))
    val hBase = MediaDedup.dhash64Bytes(base).longValue
    // PNG re-encode: different container bytes, identical pixels
    val png = MediaDedup.pngReencode(base)
    assert(!java.util.Arrays.equals(png, base))
    assert(MediaDedup.dhash64Bytes(png).longValue == hBase)
    // global +7 brightness (unclamped: base channels <= 247)
    val bright = Multimodal.SyntheticMedia.bmp24(18, 16) { (x, y) =>
      val (r, g, b) = seedPx(42)(x, y); (r + 7, g + 7, b + 7)
    }
    assert(MediaDedup.dhash64Bytes(bright).longValue == hBase)
    // right-edge sticker: only right-column comparisons can flip
    val sticker = Multimodal.SyntheticMedia.bmp24(18, 16) { (x, y) =>
      val (r, g, b) = seedPx(42)(x, y)
      if (x >= 14) (math.min(r + 80, 255), math.min(g + 80, 255),
        math.min(b + 80, 255)) else (r, g, b)
    }
    val d = java.lang.Long.bitCount(
      MediaDedup.dhash64Bytes(sticker).longValue ^ hBase)
    assert(d > 0 && d <= 16, s"sticker moved $d bits")
    // an image engineered to set bit 63 (brightest at top-right)
    // hashes negative and survives the banding round-trip
    val grad = Multimodal.SyntheticMedia.bmp24(18, 16)((x, _) =>
      (x * 14, x * 14, x * 14))
    val hg = MediaDedup.dhash64Bytes(grad).longValue
    assert(hg < 0L, f"gradient hash 0x$hg%x should set bit 63")
  }

  test("banded nearDupPairs equals the brute-force pair set") {
    // 120 docs: 12 piles of 10 (seed = id % 12) with the q154 edit
    // classes sprinkled in — pile members land within radius 3,
    // cross-pile pairs mostly outside it, and several ids decode to
    // null (excluded from pairs on both sides).
    val rows = (0L until 120L).map { id =>
      val payload: Array[Byte] =
        if (id % 29 == 11) Array[Byte](1, 2, 3) // undecodable
        else {
          val s = (id % 12).toInt * 17
          Multimodal.SyntheticMedia.bmp24(18, 16) { (x, y) =>
            val (r, g, b) = seedPx(s)(x, y)
            if (id % 5 == 2) (r + 7, g + 7, b + 7) else (r, g, b)
          }
        }
      (id, payload)
    }
    val hashed = MediaDedup.withDhash(rows.toDF("media_id", "payload"))
    val got = MediaDedup.nearDupPairs(hashed, "media_id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val hs = hashed.filter(col("dhash").isNotNull)
      .select("media_id", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture produced no near-dup pairs")
    // the undecodable ids joined nothing
    assert(!got.exists(p => p._1 % 29 == 11 || p._2 % 29 == 11))
  }

  /** Literal aHash re-derivation from a pixel function. */
  private def bruteAhash(w: Int, h: Int)
      (px: (Int, Int) => (Int, Int, Int)): Long = {
    val sums = Array.ofDim[Long](8, 8)
    val counts = Array.ofDim[Long](8, 8)
    var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val l = 299L * r + 587L * g + 114L * b
      sums(y * 8 / h)(x * 8 / w) += l
      counts(y * 8 / h)(x * 8 / w) += 1
      tot += l
    }
    val n = BigInt(w.toLong * h)
    (0 until 8).flatMap(cy => (0 until 8).map(cx =>
      if (BigInt(sums(cy)(cx)) * n > BigInt(tot) * counts(cy)(cx))
        1L << (cy * 8 + cx)
      else 0L)).reduce(_ | _)
  }

  test("ahash64 matches the literal re-derivation and is invariant " +
      "to an unclamped global brightness shift") {
    for ((w, h) <- Seq((16, 16), (8, 8), (23, 17)); seed <- Seq(0, 99)) {
      val bmp = Multimodal.SyntheticMedia.bmp24(w, h)(seedPx(seed))
      val got = MediaDedup.ahash64Bytes(bmp)
      assert(got != null && got.longValue ==
        bruteAhash(w, h)(seedPx(seed)), s"w=$w h=$h seed=$seed")
    }
    val base = Multimodal.SyntheticMedia.bmp24(16, 16)(seedPx(42))
    val bright = Multimodal.SyntheticMedia.bmp24(16, 16) { (x, y) =>
      val (r, g, b) = seedPx(42)(x, y); (r + 7, g + 7, b + 7)
    }
    assert(MediaDedup.ahash64Bytes(base) ==
      MediaDedup.ahash64Bytes(bright))
    // sub-grid refuses (aHash needs only 8 wide)
    assert(MediaDedup.ahash64Bytes(
      Multimodal.SyntheticMedia.bmp24(7, 8)(seedPx(1))) == null)
  }

  /** Literal audio-hash re-derivation from a sample function. */
  private def bruteAudioHash(n: Int)(smp: Int => Int): Long = {
    val e = new Array[Long](65); val c = new Array[Long](65)
    for (i <- 0 until n) {
      val f = (i.toLong * 65 / n).toInt
      e(f) += math.abs(smp(i).toLong); c(f) += 1
    }
    (0 until 64).map(f =>
      if (BigInt(e(f)) * c(f + 1) < BigInt(e(f + 1)) * c(f)) 1L << f
      else 0L).reduce(_ | _)
  }

  test("audioHash64 over the real WAV parser matches the literal " +
      "re-derivation; exact gain is invariant; edits are local") {
    def smp(seed: Int)(i: Int): Int =
      (seed * 131 + i * 997) % 32768 - 16384
    for (n <- Seq(65, 256, 1000); seed <- Seq(0, 7)) {
      val wav = Multimodal.SyntheticMedia.wavPcm16(8000, n)(smp(seed))
      val got = MediaDedup.audioHash64(wav)
      assert(got != null && got.longValue == bruteAudioHash(n)(smp(seed)),
        s"n=$n seed=$seed")
    }
    val base = Multimodal.SyntheticMedia.wavPcm16(8000, 256)(smp(11))
    val hBase = MediaDedup.audioHash64(base).longValue
    // exact 2x amplitude: |2s| = 2|s| cancels in the cross-mult
    val loud = Multimodal.SyntheticMedia.wavPcm16(8000, 256)(i =>
      smp(11)(i) * 2)
    assert(MediaDedup.audioHash64(loud).longValue == hBase)
    // a leading edit flips only early-frame comparisons
    val edited = Multimodal.SyntheticMedia.wavPcm16(8000, 256)(i =>
      if (i < 32) 1000 else smp(11)(i))
    val d = java.lang.Long.bitCount(
      MediaDedup.audioHash64(edited).longValue ^ hBase)
    assert(d > 0 && d <= 10, s"edit moved $d bits")
    // too short / undecodable / wrong depth hash to null
    assert(MediaDedup.audioHash64(
      Multimodal.SyntheticMedia.wavPcm16(8000, 64)(smp(1))) == null)
    assert(MediaDedup.audioHash64(Array[Byte](1, 2, 3)) == null)
  }

  test("videoFrameDhashes matches per-frame literal dHash; stride " +
      "samples; MJPEG/truncated refuse to null") {
    def fpx(f: Int)(x: Int, y: Int): (Int, Int, Int) =
      ((f * 17 + x * 7 + y * 11) % 248, (f * 13 + x * 11 + y * 3) % 248,
       (f * 19 + x * 3 + y * 13) % 248)
    val avi = Multimodal.SyntheticMedia.aviDib(18, 16, 5)(
      (f, x, y) => fpx(f)(x, y))
    val got = MediaDedup.videoFrameDhashes(avi)
    assert(got != null && got.length == 5)
    for ((f, h) <- got)
      assert(h == bruteDhash(18, 16)(fpx(f)), s"frame $f")
    val strided = MediaDedup.videoFrameDhashes(avi, frameStride = 2)
    assert(strided.map(_._1).toSeq == Seq(0, 2, 4))
    assert(strided.toSeq == got.filter(_._1 % 2 == 0).toSeq)
    // MJPEG containers are lossy-decoded — not hashed here
    val (mjpeg, _) = Multimodal.SyntheticMedia.docAviMjpeg(3)
    assert(MediaDedup.videoFrameDhashes(mjpeg) == null)
    assert(MediaDedup.videoFrameDhashes(avi.take(60)) == null)
    assert(MediaDedup.videoFrameDhashes(Array[Byte](1, 2)) == null)
  }

  test("a crafted AVI chunk size near 2^31 refuses to null instead " +
      "of bypassing the truncation guard (ADVICE r20: Long bound)") {
    // RIFF/AVI header, then a frame chunk whose declared size makes
    // p + 8 + sz wrap the Int sum negative — the old Int-math guard
    // let it through, p then went negative and the next fourcc read
    // threw StringIndexOutOfBoundsException (one crafted payload
    // killing a whole corpus pass).
    val evil = new Array[Byte](64)
    def put4(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(evil, off)
    def putLe32(off: Int, v: Int): Unit = {
      evil(off) = (v & 0xff).toByte
      evil(off + 1) = ((v >>> 8) & 0xff).toByte
      evil(off + 2) = ((v >>> 16) & 0xff).toByte
      evil(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    put4(0, "RIFF"); putLe32(4, 56); put4(8, "AVI ")
    put4(12, "00db"); putLe32(16, Int.MaxValue - 15) // 20+sz wraps
    // both walks must refuse, not crash
    assert(MediaDedup.videoFrameDhashes(evil) == null)
    assert(MediaDedup.videoFrameDhashesMjpeg(evil) == null)
    assert(Multimodal.MediaDecoder.AviDib()
      .decodeToFeatures("avi", evil) == null)
    // a LIST whose size wraps the recursion bound must refuse too
    val evil2 = new Array[Byte](64)
    put4(0, "RIFF"); putLe32(4, 56); put4(8, "AVI ")
    put4(12, "LIST"); putLe32(16, Int.MaxValue - 15); put4(20, "movi")
    assert(MediaDedup.videoFrameDhashes(evil2) == null)
    assert(Multimodal.MediaDecoder.AviDib()
      .decodeToFeatures("avi", evil2) == null)
  }

  test("MJPEG frame-hash route (VERDICT r19 ask #7): per-frame hash " +
      "== dhash64Bytes of the standalone JPEG; stride; symmetric " +
      "codec refusal; re-mux identity; re-encode drift bounded; " +
      "hash-table codec arm + pairing") {
    val (avi, jpegs) = Multimodal.SyntheticMedia.docAviMjpeg(
      7, nFrames = 5)
    val got = MediaDedup.videoFrameDhashesMjpeg(avi)
    assert(got != null && got.length == 5)
    for ((f, h) <- got)
      assert(h == MediaDedup.dhash64Bytes(jpegs(f)).longValue,
        s"frame $f") // the route's contract: hash of the JPEG bytes
    val strided = MediaDedup.videoFrameDhashesMjpeg(avi, frameStride = 2)
    assert(strided.map(_._1).toSeq == Seq(0, 2, 4))
    assert(strided.toSeq == got.filter(_._1 % 2 == 0).toSeq)
    // codec refusal is symmetric: DIB refuses here, MJPEG refuses
    // the DIB route (spec'd above), garbage/truncation refuse
    def fpx(f: Int)(x: Int, y: Int): (Int, Int, Int) =
      ((f * 17 + x * 7 + y * 11) % 248, (f * 13 + x * 11 + y * 3) % 248,
       (f * 19 + x * 3 + y * 13) % 248)
    val dib = Multimodal.SyntheticMedia.aviDib(18, 16, 3)(
      (f, x, y) => fpx(f)(x, y))
    assert(MediaDedup.videoFrameDhashesMjpeg(dib) == null)
    assert(MediaDedup.videoFrameDhashesMjpeg(Array[Byte](1, 2)) == null)
    // one undecodable frame -> whole-video refusal (a half-hashed
    // video must not pair on its decodable prefix)
    val broken = Multimodal.SyntheticMedia.aviMjpeg(16, 12,
      jpegs.init :+ Array[Byte](1, 2, 3))
    assert(MediaDedup.videoFrameDhashesMjpeg(broken) == null)
    // re-MUX (same JPEG bytes, rebuilt container): identical hashes
    val remux = Multimodal.SyntheticMedia.aviMjpeg(16, 12, jpegs)
    assert(MediaDedup.videoFrameDhashesMjpeg(remux).toSeq == got.toSeq)
    // second-generation re-ENCODE (lossy decode + re-encode of each
    // frame): dHash is the stability lens — drift stays small
    val reenc = Multimodal.SyntheticMedia.aviMjpeg(16, 12,
      jpegs.map(MediaDedup.jpegReencode))
    val gh = MediaDedup.videoFrameDhashesMjpeg(reenc)
    assert(gh != null && gh.length == 5)
    for (((_, h1), (_, h0)) <- gh.zip(got)) {
      val d = java.lang.Long.bitCount(h1 ^ h0)
      assert(d <= 10, s"re-encode moved $d bits")
    }
    // hash-table codec arm: MJPEG videos hash, DIB payloads surface
    // as sentinels (undecodable UNDER THIS ROUTE), pairing finds the
    // re-mux class; unknown codec refused loudly
    val rows = Seq((1L, avi), (2L, remux),
      (3L, Multimodal.SyntheticMedia.docAviMjpeg(8, nFrames = 5)._1),
      (4L, dib)).toDF("media_id", "payload")
    val fh = MediaDedup.videoFrameHashTable(rows, codec = "mjpeg")
    val byId = fh.collect().groupBy(_.getLong(0))
    assert(byId(1L).length == 5 && byId(2L).length == 5)
    assert(byId(4L).length == 1 && byId(4L).head.isNullAt(2))
    val pairs = MediaDedup.sharedFrameVideoPairs(fh, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(pairs == Set((1L, 2L, 5L)))
    intercept[IllegalArgumentException] {
      MediaDedup.videoFrameHashTable(rows, codec = "h264")
    }
  }

  test("videoFrameHashTable surfaces undecodable videos as sentinel " +
      "rows; videoDecodeAudit reads the failure rate off the same " +
      "scan; pairing filters the sentinels (VERDICT r19 ask #3)") {
    def fpx(f: Int)(x: Int, y: Int): (Int, Int, Int) =
      ((f * 17 + x * 7 + y * 11) % 248, (f * 13 + x * 11 + y * 3) % 248,
       (f * 19 + x * 3 + y * 13) % 248)
    val good = Multimodal.SyntheticMedia.aviDib(18, 16, 5)(
      (f, x, y) => fpx(f)(x, y))
    val (mjpeg, _) = Multimodal.SyntheticMedia.docAviMjpeg(3)
    val rows = Seq(
      (0L, good),
      (1L, good.take(80)),                    // truncated: undecodable
      (2L, mjpeg),                            // MJPEG: not hashed here
      (3L, null.asInstanceOf[Array[Byte]]))   // null payload
    val fh = MediaDedup.videoFrameHashTable(
      rows.toDF("media_id", "payload"))
    val byId = fh.collect().groupBy(_.getLong(0))
    assert(byId(0L).length == 5 && byId(0L).forall(!_.isNullAt(2)))
    for (id <- 1L to 3L) {
      assert(byId(id).length == 1, s"id $id")
      assert(byId(id).head.isNullAt(1) && byId(id).head.isNullAt(2))
    }
    val audit = MediaDedup.videoDecodeAudit(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(audit == Set((0L, 5L, true), (1L, 0L, false),
      (2L, 0L, false), (3L, 0L, false)))
    // stride sampling shows up in the audit count
    val strided = MediaDedup.videoDecodeAudit(
      MediaDedup.videoFrameHashTable(
        rows.toDF("media_id", "payload"), frameStride = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(strided(0L) == 3L && strided(1L) == 0L)
    // sentinels never reach the pair stage: a second identical good
    // video pairs on all 5 frames, the undecodable ids join nothing
    val withDup = (rows :+ (4L, good)).toDF("media_id", "payload")
    val pairs = MediaDedup.sharedFrameVideoPairs(
        MediaDedup.videoFrameHashTable(withDup), minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(pairs == Set((0L, 4L, 5L)))
  }

  test("sharedFrameVideoPairs counts distinct shared frame hashes; " +
      "the boilerplate cap drops hot frames") {
    // videos 0,1: same 4 frames; video 2: shares 2 of them; all
    // three plus 3..9 share one "intro" hash (the hot frame).
    val rows = Seq(
      (0L, 0, 100L), (0L, 1, 101L), (0L, 2, 102L), (0L, 3, 103L),
      (1L, 0, 100L), (1L, 1, 101L), (1L, 2, 102L), (1L, 3, 103L),
      (2L, 0, 102L), (2L, 1, 103L), (2L, 2, 555L),
      (2L, 3, 555L)) ++ // repeated in-video frame counts ONCE
      (0L to 9L).map(v => (v, 9, 777L)) // intro card everywhere
    val fh = rows.toDF("media_id", "frame_idx", "dhash")
    val got = MediaDedup.sharedFrameVideoPairs(fh, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // 0-1 share {100,101,102,103,777} = 5; 0-2 and 1-2 share
    // {102,103,777} = 3; everyone else only the intro (1 < 2)
    assert(got == Set((0L, 1L, 5L), (0L, 2L, 3L), (1L, 2L, 3L)))
    val capped = MediaDedup.sharedFrameVideoPairs(fh, minShared = 2,
        maxVideosPerHash = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // 777 appears in 10 > 5 videos: dropped everywhere
    assert(capped == Set((0L, 1L, 4L), (0L, 2L, 2L), (1L, 2L, 2L)))
  }

  test("nearDupPairs maxBucket caps hot band buckets one-sidedly") {
    // 30 hashes differing only in band-0 low bits: every one shares
    // the same three upper 16-bit words, so bands 1-3 each hold ONE
    // 30-hash bucket while band 0 holds 30 singletons — every
    // radius-3 pair is found ONLY via the hot bands. Capping
    // buckets at 10 drops bands 1-3 entirely -> no surviving
    // agreeing band -> no pairs; a cap above the bucket size
    // changes nothing.
    val hs = (0L until 30L).map(i => 0x7770666055500000L | i)
    val expect = (for {
      a <- hs; b <- hs if a < b
      if java.lang.Long.bitCount(a ^ b) <= 3
    } yield 1).size.toLong
    assert(expect > 100L) // the fixture is genuinely pair-dense
    val rows = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("media_id", "dhash")
    assert(MediaDedup.nearDupPairs(rows, maxHamming = 3).count()
      == expect)
    assert(MediaDedup.nearDupPairs(rows, maxHamming = 3,
      maxBucket = 10L).count() == 0L)
    assert(MediaDedup.nearDupPairs(rows, maxHamming = 3,
      maxBucket = 64L).count() == expect)
  }

  test("canonicalMedia: pairs -> components -> keep-best survivor " +
      "with min-id ties; singletons keep themselves (r19 ask #1)") {
    // chain component {1,2,3} (transitive through 2), pile {5,6},
    // singleton 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val nodes = Seq(
      (1L, 100L), (2L, 300L), (3L, 300L), // quality tie at 300
      (5L, 50L), (6L, 50L),               // full tie -> min id
      (7L, 10L)).toDF("media_id", "quality")
    val got = MediaDedup.canonicalMedia(nodes, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, 1L, 2L, false, 100L), // highest quality wins over min id
      (2L, 1L, 2L, true, 300L),  // quality tie 2 vs 3 -> smaller id
      (3L, 1L, 2L, false, 300L),
      (5L, 5L, 5L, true, 50L),   // full tie -> min id survives
      (6L, 5L, 5L, false, 50L),
      (7L, 7L, 7L, true, 10L)))  // singleton: own survivor
    // end-to-end over real images: the highest-resolution member of
    // a dHash cluster survives (2x nearest-neighbor upscale shares
    // the hash exactly: every 9x8 cell doubles uniformly)
    def px(x: Int, y: Int): (Int, Int, Int) = seedPx(21)(x, y)
    val base = Multimodal.SyntheticMedia.bmp24(18, 16)(px)
    val up = Multimodal.SyntheticMedia.bmp24(36, 32)((x, y) =>
      px(x / 2, y / 2))
    assert(MediaDedup.dhash64Bytes(up) == MediaDedup.dhash64Bytes(base))
    val media = Seq((10L, base), (11L, up), (12L, base))
      .toDF("media_id", "payload")
    val hashed = MediaDedup.withDhash(media)
    val meta = Multimodal.headerMeta(media)
      .select(col("media_id"),
        (col("meta_width") * col("meta_height")).as("quality"))
    val out = MediaDedup.canonicalMedia(meta,
        MediaDedup.nearDupPairs(hashed))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getLong(4))).toSet
    assert(out == Set((10L, false, 288L), (11L, true, 1152L),
      (12L, false, 288L)))
  }

  test("cap-drop report frames equal the over-cap histograms the " +
      "caps act on (VERDICT r19 ask #5)") {
    // image side: the 30-hash hot-band fixture — bands 1..3 each
    // hold ONE 30-hash bucket, band 0 thirty singletons.
    val hs = (0L until 30L).map(i => 0x7770666055500000L | i)
    val rows = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("media_id", "dhash")
    val got = MediaDedup.nearDupDroppedBuckets(rows, maxBucket = 10L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    // independent histogram: band b of hash h = (h >>> 16b) & 0xffff
    val expect = (for { h <- hs.distinct; b <- 0 until 4 }
      yield (b, (h >>> (b * 16)) & 0xffffL))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > 10L)
      .map { case ((b, k), n) => (b, k, n) }.toSet
    assert(got == expect && got.size == 3 &&
      got.forall(_._3 == 30L))
    // a cap above every bucket reports nothing
    assert(MediaDedup.nearDupDroppedBuckets(rows, maxBucket = 64L)
      .count() == 0L)
    // video side: the shared-frame fixture — intro hash 777 sits in
    // 10 videos; with cap 5 it is the one reported row, counted over
    // distinct (video, hash) exactly as the pair path collapses.
    val fRows = Seq(
      (0L, 0, 100L), (0L, 1, 101L), (0L, 2, 102L), (0L, 3, 103L),
      (1L, 0, 100L), (1L, 1, 101L), (1L, 2, 102L), (1L, 3, 103L),
      (2L, 0, 102L), (2L, 1, 103L), (2L, 2, 555L), (2L, 3, 555L)) ++
      (0L to 9L).map(v => (v, 9, 777L))
    val fh = fRows.toDF("media_id", "frame_idx", "dhash")
    val hot = MediaDedup.sharedFrameHotHashes(fh, maxVideosPerHash = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hot == Set((777L, 10L)))
    // 555 repeats WITHIN one video only: never hot at cap 1
    val hot1 = MediaDedup.sharedFrameHotHashes(fh, maxVideosPerHash = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hot1 == Set((100L, 2L), (101L, 2L), (102L, 3L),
      (103L, 3L), (777L, 10L)))
  }

  test("dualLensPairs: a brightness dupe survives both lenses, a " +
      "gradient coincidence falls out of aHash (r19 ask #6); one " +
      "decode feeds both hashes") {
    // base: pure horizontal luma ramp (8x per channel, max 136)
    def ramp(x: Int, y: Int): (Int, Int, Int) = (8 * x, 8 * x, 8 * x)
    val base = Multimodal.SyntheticMedia.bmp24(18, 16)(ramp)
    // true dupe: unclamped global +7 — invariant under BOTH lenses
    val bright = Multimodal.SyntheticMedia.bmp24(18, 16) { (x, y) =>
      val (r, g, b) = ramp(x, y); (r + 7, g + 7, b + 7)
    }
    // gradient coincidence: +100 on the bottom half preserves every
    // within-row ordering (same dHash) but moves block levels far
    // from the global mean (aHash flips many bits)
    val shifted = Multimodal.SyntheticMedia.bmp24(18, 16) { (x, y) =>
      val (r, g, b) = ramp(x, y)
      if (y >= 8) (r + 100, g + 100, b + 100) else (r, g, b)
    }
    assert(MediaDedup.dhash64Bytes(shifted) ==
      MediaDedup.dhash64Bytes(base))
    val aDist = java.lang.Long.bitCount(
      MediaDedup.ahash64Bytes(shifted).longValue ^
      MediaDedup.ahash64Bytes(base).longValue)
    assert(aDist > 3, s"fixture too weak: ahash moved only $aDist bits")
    val media = Seq((0L, base), (1L, bright), (2L, shifted))
      .toDF("media_id", "payload")
    val hashed = MediaDedup.withImageHashes(media)
    // the one-decode kernel agrees with the per-lens kernels
    val h = hashed.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(h(0L) == ((MediaDedup.dhash64Bytes(base).longValue,
      MediaDedup.ahash64Bytes(base).longValue)))
    val got = MediaDedup.dualLensPairs(hashed)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[String]("agreement"))).toMap
    assert(got((0L, 1L)) == "both")
    assert(got((0L, 2L)) == "dhash_only")
    assert(got((1L, 2L)) == "dhash_only")
    assert(got.size == 3)
  }

  test("an AVI header declaring huge dims nulls out instead of " +
      "wrapping the corrupt-frame guard (ADVICE r19: Long stride)") {
    // strf biWidth/biHeight patched to 20000x40000: the Int product
    // rowBytes*height wraps negative, the old guard passed vacuously
    // and the pixel loop read past the payload.
    val avi = Multimodal.SyntheticMedia.aviDib(18, 16, 2)((f, x, y) =>
      ((f + x) % 256, y % 256, 7))
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >>> 8) & 0xff).toByte
      b(off + 2) = ((v >>> 16) & 0xff).toByte
      b(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    val evil = avi.clone()
    putLe32(evil, 176, 20000) // strf biWidth
    putLe32(evil, 180, 40000) // strf biHeight
    assert(MediaDedup.videoFrameDhashes(evil) == null)
    // the feature decoder shares the stride arithmetic: same refusal
    val feats = Multimodal.MediaDecoder.AviDib()
      .decodeToFeatures("video", evil)
    assert(feats == null)
  }

  test("sub-grid and null payloads hash to null") {
    val tiny = Multimodal.SyntheticMedia.bmp24(8, 8)(seedPx(3))
    assert(MediaDedup.dhash64Bytes(tiny) == null)
    val out = MediaDedup.withDhash(
      Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload"))
      .select("dhash").collect()
    assert(out(0).isNullAt(0))
  }
}
