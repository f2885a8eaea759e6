package graft

import graft.model.Tables
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.syntheticMedia(Tables.documents(spark, sf)).cache()

  test("media schema: binary content + typed metadata") {
    val sch = media.schema
    assert(sch("content").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "map")
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic, unit-L1, fixed-dim") {
    val f1 = Multimodal.extractFeatures(media).collect()
    val f2 = Multimodal.extractFeatures(media).collect()
    assert(f1.map(_.id).sorted.sameElements(f2.map(_.id).sorted))
    f1.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3)
      assert(f.n_bytes > 0)
    }
    val m1 = f1.map(f => f.id -> f.features.toSeq).toMap
    val m2 = f2.map(f => f.id -> f.features.toSeq).toMap
    assert(m1 == m2)
  }

  test("frame sampling emits strided frames for video rows only") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    val kinds = media.select("id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    frames.foreach { f =>
      assert(kinds(f.id) == "video")
      assert(f.frame_no % 2 == 0)
      assert(f.frame.length <= 64)
    }
  }

  test("resize truncates oversized images and tags metadata") {
    val resized = Multimodal.resizeImages(media, budget = 100).collect()
    resized.filter(_.kind == "image").foreach { r =>
      assert(r.content.length <= 100)
      if (r.meta.contains("resized")) assert(r.content.length == 100)
    }
    // non-images untouched
    assert(resized.filter(_.kind != "image").forall(!_.meta.contains("resized")))
  }

  test("real PNG round-trip: encode → javax.imageio decode recovers the exact pixels") {
    val gray = Array.tabulate(16 * 16)(i => (i * 7) % 256)
    val png = Multimodal.encodeGrayPng(Multimodal.DecodedImage(16, 16, gray))
    // a real PNG, not a fake payload
    assert(png.take(4).map(_ & 0xFF).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val back = Multimodal.decodeGray(png).get
    assert(back.width == 16 && back.height == 16)
    assert(back.gray.toSeq == gray.toSeq) // lossless
    // undecodable payloads are None, not an exception
    assert(Multimodal.decodeGray("not an image".getBytes).isEmpty)
  }

  test("imageStats through the real decoder matches the pixel formula") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 5L).toDF("doc_id")
    val stats = Multimodal.imageStats(Multimodal.syntheticImages(docs).toDF())
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (id <- Seq(0L, 1L, 5L)) {
      val px = (0 until 256).map(i => (id * 31 + i) % 256)
      assert(stats(id) == ((16L, 16L, 256L, px.sum, px.count(_ < 128).toLong)))
    }
  }

  test("perceptual aHash matches the formula, finds the planted twins, and is shift-tolerant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ids 256 apart render IDENTICAL pixels ((id*31) mod 256 collides) —
    // true planted image twins
    val docs = Seq(0L, 1L, 7L, 256L, 257L).toDF("doc_id")
    val hashes = Multimodal.perceptualHashes(
      Multimodal.syntheticImages(docs).toDF())
    val h = hashes.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // formula parity: recompute id 7's hash from the pixel formula
    val samples = (0 until 64).map(i => (7L * 31 + (2 * (i / 8)) * 16 + 2 * (i % 8)) % 256)
    val sum = samples.sum
    var lo = 0L; var hi = 0L
    for (k <- 0 until 64 if 64L * samples(k) >= sum)
      if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
    assert(h(7L) == ((lo, hi)))
    // halves stay in u32 (never touch the BIGINT sign)
    h.values.foreach { case (l, hh) =>
      assert(l >= 0 && l <= 0xFFFFFFFFL && hh >= 0 && hh <= 0xFFFFFFFFL)
    }
    assert(h(0L) == h(256L) && h(1L) == h(257L))
    val pairs = Multimodal.phashPairs(hashes, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 256L)) && pairs.contains((1L, 257L)))
    assert(pairs((0L, 256L)) == 0L)
    // the fence refuses unbounded all-pairs
    intercept[IllegalArgumentException] {
      Multimodal.phashPairs(hashes, 4, maxRows = 2).collect()
    }
  }

  test("banded Hamming pairs are bit-identical to the all-pairs audit") {
    import spark.implicits._
    // 200 docs incl. planted twins (id, id+256 collide mod 256) — enough
    // hash diversity that several pairs land at each distance 0..8
    val docs = ((0L until 150L) ++ (256L until 306L)).toDF("doc_id")
    val hashes = Multimodal.perceptualHashes(
      Multimodal.syntheticImages(docs).toDF()).cache()
    try {
      for (k <- Seq(0, 3, 4, 8)) {
        val audit = Multimodal.phashPairs(hashes, k).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val banded = Multimodal.phashPairsBanded(hashes, k).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(banded == audit, s"banded != audit at maxHamming=$k")
      }
      // the planted twins surface at hamming 0 through the banded path
      val zero = Multimodal.phashPairsBanded(hashes, 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(zero.contains((0L, 256L)) && zero.contains((49L, 305L)))
    } finally hashes.unpersist()
  }

  test("PNG-concat container walk: exact frame ranges, strided keyframes, formula-exact pixels") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 4L, 7L).toDF("doc_id")
    val vids = Multimodal.syntheticVideos(docs).collect()
    // every container walks into exactly (doc_id mod 5) + 3 member
    // frames whose ranges tile the payload end-to-end
    vids.foreach { v =>
      val ranges = Multimodal.pngFrameRanges(v.content)
      assert(ranges.size == ((v.id % 5) + 3).toInt, s"doc ${v.id}")
      assert(ranges.head._1 == 0 && ranges.last._2 == v.content.length)
      assert(ranges.sliding(2).forall {
        case Seq((_, e), (s2, _)) => e == s2
        case _ => true
      })
    }
    // strided keyframes decode to the exact per-frame pixel formula
    val stats = Multimodal.keyframeStats(
      Multimodal.sampleKeyframes(Multimodal.syntheticVideos(docs).toDF(), 2))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val expected = (for {
      id <- Seq(0L, 1L, 4L, 7L)
      f <- 0 until ((id % 5) + 3).toInt if f % 2 == 0
    } yield {
      val px = (0 until 256).map(i => (id * 31 + f * 17 + i) % 256)
      (id, f.toLong) -> (16L, 16L, 256L, px.sum, px.count(_ < 128).toLong)
    }).toMap
    assert(stats == expected)
    // a payload that is not a PNG container yields no frames (quarantine)
    assert(Multimodal.pngFrameRanges("not a png at all".getBytes("UTF-8")).isEmpty)
    // trailing garbage after a valid frame stops at the last good frame
    val one = vids.find(_.id == 0L).get
    val firstEnd = Multimodal.pngFrameRanges(one.content).head._2
    val garbled = java.util.Arrays.copyOfRange(one.content, 0, firstEnd) ++
      Array[Byte](1, 2, 3, 4, 5)
    assert(Multimodal.pngFrameRanges(garbled) == Seq((0, firstEnd)))
  }

  test("WAV round-trip: real RIFF chunk walk decodes the exact PCM samples, skips unknown chunks") {
    import spark.implicits._
    val docs = Seq(0L, 3L, 5L).toDF("doc_id")
    val wavs = Multimodal.syntheticAudio(docs).collect()
    wavs.foreach { w =>
      val a = Multimodal.decodePcm(w.content).get
      val n = (((w.id % 4) + 1) * 256).toInt
      assert(a.sampleRate == 8000 && a.channels == 1 && a.samples.length == n)
      val expected = (0 until n).map(i => ((w.id * 37 + i * 17) % 65536).toInt - 32768)
      assert(a.samples.toSeq == expected, s"doc ${w.id}")
    }
    // an unknown chunk BEFORE data must be skipped by size, not break
    // the parse (LIST/fact/cue chunks are routine in real files)
    val one = wavs.head.content
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++
      Array[Byte](9, 9, 9, 9, 9, 9)
    val withJunk = one.slice(0, 12) ++ junk ++ one.slice(12, one.length)
    // fix the RIFF size field for the inserted bytes
    val sz = (one.length - 8) + junk.length
    withJunk(4) = (sz & 0xff).toByte; withJunk(5) = ((sz >> 8) & 0xff).toByte
    withJunk(6) = ((sz >> 16) & 0xff).toByte; withJunk(7) = ((sz >> 24) & 0xff).toByte
    assert(Multimodal.decodePcm(withJunk).map(_.samples.length) ==
      Multimodal.decodePcm(one).map(_.samples.length))
    // malformed payloads quarantine (None), never throw
    assert(Multimodal.decodePcm("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePcm("not audio".getBytes("UTF-8")).isEmpty)
    // audioStats through the distributed path matches the formula
    val stats = Multimodal.audioStats(Multimodal.syntheticAudio(docs).toDF())
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exp = Seq(0L, 3L, 5L).map { id =>
      val n = (((id % 4) + 1) * 256).toInt
      val vs = (0 until n).map(i => ((id * 37 + i * 17) % 65536) - 32768)
      id -> (n.toLong, vs.map(v => math.abs(v)).sum, vs.map(v => math.abs(v)).max)
    }.toMap
    assert(stats == exp)
    // STEREO: interleaved frames decode whole, n_samples counts FRAMES,
    // sum/peak span both channels; a block align inconsistent with the
    // channel count quarantines (ADVICE r6)
    def stereoWav(samples: Seq[Int], blockAlign: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      def le16(v: Int): Unit = (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
      bos.write("RIFF".getBytes("US-ASCII")); le32(36 + data.length)
      bos.write("WAVE".getBytes("US-ASCII"))
      bos.write("fmt ".getBytes("US-ASCII")); le32(16)
      le16(1); le16(2) /* stereo */ ; le32(8000); le32(8000 * 4)
      le16(blockAlign); le16(16)
      bos.write("data".getBytes("US-ASCII")); le32(data.length)
      bos.write(data)
      bos.toByteArray
    }
    val st = Multimodal.decodePcm(stereoWav(Seq(100, -200, 300, -400, 7), 4)).get
    assert(st.channels == 2)
    assert(st.samples.toSeq == Seq(100, -200, 300, -400)) // trailing half-frame dropped
    val stStats = Multimodal.audioStats(Seq(
      Multimodal.MediaRow(9L, "audio", stereoWav(Seq(100, -200, 300, -400), 4),
        Map.empty[String, String])).toDF()).collect().head
    assert((stStats.getLong(2), stStats.getLong(3), stStats.getLong(4)) == (2L, 1000L, 400L))
    assert(Multimodal.decodePcm(stereoWav(Seq(1, 2), 2)).isEmpty) // block align ≠ channels×2
  }

  test("audioChunks: whole chunks recompose the doc totals; partial tails drop") {
    import spark.implicits._
    val docs = Seq(0L, 3L, 5L).toDF("doc_id")
    val wavs = Multimodal.syntheticAudio(docs).toDF()
    val chunks = Multimodal.audioChunks(wavs, 128).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val stats = Multimodal.audioStats(wavs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // every synthetic length is a multiple of 128 → chunk count n/128,
    // chunk sums recompose the doc sum, chunk peaks max to the doc peak
    stats.foreach { case (id, (n, sumAbs, peak)) =>
      val mine = chunks.filter(_._1._1 == id).values.toSeq
      assert(mine.size.toLong === n / 128)
      assert(mine.forall(_._1 == 128L))
      assert(mine.map(_._2).sum === sumAbs)
      assert(mine.map(_._3).max === peak)
    }
    // chunk boundaries are frame-exact: chunk 0 of doc 0 is the formula
    // over i in [0, 128)
    val vs = (0 until 128).map(i => math.abs(((0L * 37 + i * 17) % 65536) - 32768))
    assert(chunks((0L, 0L)) === ((128L, vs.sum, vs.max.toLong)))
    // a signal shorter than one chunk yields no rows (tail dropped), and
    // a 1.5-chunk signal yields exactly the whole chunk
    assert(Multimodal.audioChunks(wavs, 4096).collect().isEmpty)
    val oneAndHalf = Multimodal.audioChunks(wavs.where(org.apache.spark.sql.functions.col("id") === 0L), 170)
      .collect() // doc 0 has 256 frames → one whole 170-frame chunk
    assert(oneAndHalf.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 0L)))
  }

  test("shotBoundaries: one row per consecutive sampled pair, exact Hamming") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 3L, 4L).toDF("doc_id")
    val hashes = Multimodal.keyframeHashes(
      Multimodal.sampleKeyframes(Multimodal.syntheticVideos(docs).toDF(), 2))
    val hs = hashes.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val rows = Multimodal.shotBoundaries(hashes, 16).collect()
    // per video: sampled frames sorted; rows = consecutive pairs
    val byVid = hs.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    val expected = byVid.toSeq.flatMap { case (id, fs) =>
      fs.zip(fs.drop(1)).map { case (a, b) =>
        val (alo, ahi) = hs((id, a)); val (blo, bhi) = hs((id, b))
        val ham = java.lang.Long.bitCount(alo ^ blo) + java.lang.Long.bitCount(ahi ^ bhi)
        (id, a, b, ham.toLong, if (ham >= 16) 1L else 0L)
      }
    }.toSet
    val got = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
    // pair counts follow the sampled-frame counts (doc 0 has 3 frames →
    // sampled {0, 2} → 1 pair; doc 2 has 5 → sampled {0, 2, 4} → 2)
    assert(rows.count(_.getLong(0) == 0L) === 1)
    assert(rows.count(_.getLong(0) == 2L) === 2)
    // and a one-sampled-frame input yields no rows at all
    assert(Multimodal.shotBoundaries(
      hashes.where(org.apache.spark.sql.functions.col("id") === 0L && org.apache.spark.sql.functions.col("frame_no") === 0L), 16).collect().isEmpty)
  }

  test("resizeDecoded is true nearest-neighbor resampling, verified post-round-trip") {
    import spark.implicits._
    val docs = Seq(3L).toDF("doc_id")
    val resized = Multimodal.resizeDecoded(
      Multimodal.syntheticImages(docs).toDF(), 8, 8).collect().head
    val img = Multimodal.decodeGray(resized.content).get
    assert(img.width == 8 && img.height == 8)
    val expected = for (y <- 0 until 8; x <- 0 until 8)
      yield ((3L * 31 + (2 * y) * 16 + 2 * x) % 256).toInt
    assert(img.gray.toSeq == expected)
    assert(resized.meta("resized") == "8x8")
  }

  test("aspect buckets: real decode dims, boundary ratios, ceil batching") {
    import spark.implicits._
    // doc_id mod (5,3) → (w,h): id 0 → 8×8 square; id 1 → 12×16
    // (3h=48 ≥ 4w=48: portrait AT the 3:4 boundary); id 2 → 16×24
    // portrait; id 3 → 20×8 landscape; id 4 → 24×16 landscape
    val docs = (0L to 4L).toDF("doc_id")
    val media = Multimodal.syntheticImagesVar(docs).toDF()
    // the decoder, not the metadata, must supply dims
    val dims = Multimodal.imageStats(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dims == Map(0L -> ((8L, 8L)), 1L -> ((12L, 16L)),
      2L -> ((16L, 24L)), 3L -> ((20L, 8L)), 4L -> ((24L, 16L))), s"$dims")
    val got = Multimodal.aspectBuckets(media, pxBudget = 400L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // portrait px: 192 + 384 = 576 → ceil(576/400) = 2 batches;
    // landscape px: 160 + 384 = 544 → 2; square px: 64 → 1
    assert(got == Map(
      "square" -> ((1L, 64L, 1L)),
      "portrait" -> ((2L, 576L, 2L)),
      "landscape" -> ((2L, 544L, 2L))), s"$got")
  }
}
