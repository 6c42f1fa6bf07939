package graft.operators

/** A pure-JDK YUV4MPEG2 (y4m) demuxer — the REAL-container seam for
  * [[Multimodal.frameSigsWith]] that executes with no external binary.
  *
  * y4m is an uncompressed textbook container (an ASCII stream header, then
  * per-frame `FRAME`-prefixed raw planes), so demuxing it needs no codec:
  * parse the header's W/H/colorspace, then walk frame-sized strides. It is
  * the hermetic third demuxer beside [[Multimodal.frameSigStub]] (fake
  * fixed-stride payloads) and [[FfmpegDemux.frameSigs]] (the CLI path for
  * compressed containers, absent in sandboxes without ffmpeg): the
  * container-format code path — header parse, per-frame plane walk,
  * corrupt-payload sentinel — runs unconditionally in ExamplesSpec, and
  * when ffmpeg IS present its FrameSigs must equal FfmpegDemux's on the
  * same clip (both reduce each frame to a luma sum; the spec asserts it).
  *
  * Contract matches the other demuxers: one [[Multimodal.FrameSig]] per
  * frame, `n_bytes` = luma-plane size, `level_sum` = Σ luma bytes;
  * malformed/truncated payloads yield the single sentinel
  * `FrameSig(id, -1, 0, -1)` — corrupt media is a row to count, never an
  * exception that kills the partition. Scale shape: pure per-row function
  * under the same typed mapPartitions as the stub — no shuffle, no
  * process spawn, one O(W·H) pass per frame.
  */
object Y4mDemux {

  /** SigDemux for [[Multimodal.frameSigsWith]]: y4m bytes → one FrameSig
    * per frame. Only the luma (Y) plane is summed — chroma planes are
    * strided over; C420/C422/C444/Cmono subsamplings are supported (the
    * set every y4m writer in practice emits). */
  def frameSigs(id: Long, payload: Array[Byte])
      : Iterator[Multimodal.FrameSig] = {
    val sentinel = Iterator.single(Multimodal.FrameSig(id, -1, 0, -1L))
    try {
      val nl = payload.indexOf('\n'.toByte)
      if (nl < 0) return sentinel
      val header = new String(payload, 0, nl, "US-ASCII")
      val tokens = header.split(' ')
      if (tokens.isEmpty || tokens(0) != "YUV4MPEG2") return sentinel
      def param(tag: Char): Option[String] =
        tokens.drop(1).find(t => t.nonEmpty && t.head == tag).map(_.tail)
      val w = param('W').map(_.toInt).getOrElse(return sentinel)
      val h = param('H').map(_.toInt).getOrElse(return sentinel)
      if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return sentinel
      val luma = w * h
      // chroma stride by colorspace family (default per spec: 4:2:0).
      // Long arithmetic: C444's 2*luma (and the frame stride below) can
      // wrap int for W*H near Int.MaxValue, which would turn the
      // truncation check negative and skip it (ADVICE r15) — the
      // sentinel must come from the guard, not an incidental AIOOBE.
      val cs = param('C').getOrElse("420jpeg")
      val chroma: Long =
        if (cs.startsWith("mono")) 0L
        else if (cs.startsWith("444")) 2L * luma
        else if (cs.startsWith("422")) 2L * (w / 2) * h
        else 2L * (w / 2) * (h / 2) // 420 family
      val sigs = scala.collection.mutable.ArrayBuffer
        .empty[Multimodal.FrameSig]
      var pos = nl + 1
      while (pos < payload.length) {
        // FRAME marker line (may carry parameters; ends at \n)
        val end = payload.indexOf('\n'.toByte, pos)
        if (end < 0 ||
          new String(payload, pos, math.min(5, end - pos), "US-ASCII")
            != "FRAME") return sentinel
        val dataStart = end + 1
        if (dataStart.toLong + luma + chroma > payload.length)
          return sentinel
        var sum = 0L
        var i = dataStart
        val stop = dataStart + luma
        while (i < stop) { sum += payload(i) & 0xff; i += 1 }
        sigs += Multimodal.FrameSig(id, sigs.length, luma, sum)
        // fits int: the Long guard above bounded it by payload.length
        pos = (dataStart.toLong + luma + chroma).toInt
      }
      if (sigs.isEmpty) sentinel else sigs.iterator
    } catch {
      case scala.util.control.NonFatal(_) => sentinel
    }
  }
}
