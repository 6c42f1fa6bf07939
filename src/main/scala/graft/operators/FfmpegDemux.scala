package graft.operators

/** The INJECTED-video seam made executable: a demuxer for
  * [[Multimodal.frameSigsWith]] / [[Multimodal.framesInContext]] backed by
  * the ffmpeg CLI — the documented production path for container formats
  * (mp4/webm/mkv) that have no in-JDK codec (ImageIO covers GIF only).
  *
  * Shape: ONE ffmpeg process per video row (a container is one seekable
  * input; processes don't span rows), decoding to a fixed small grayscale
  * raster (`-pix_fmt gray -vf scale=32:24`) streamed over stdout. Fixing
  * the raster makes parsing trivial (every frame is exactly 32·24 bytes),
  * bounds per-frame memory to one raster regardless of source resolution,
  * and normalizes re-renders the way the scene operators expect: the
  * FrameSig level sums feed [[Multimodal.sceneFramesOf]] unchanged.
  *
  * Memory: the demux never holds a decoded video — it streams raster-sized
  * chunks off the pipe keeping one running sum per frame, so a 2-hour clip
  * costs 16 bytes per frame of output plus one 768-byte read buffer.
  * Failure convention matches [[ImageCodec.gifFrameSigsComposed]]:
  * an undecodable payload yields the single sentinel
  * `FrameSig(id, -1, 0, -1)` — corrupt media is a row to count, never an
  * exception that kills the partition.
  *
  * Presence-gated: [[available]] resolves the binary once per JVM
  * (driver or executor); a cluster without ffmpeg on PATH keeps the stub
  * demuxers and the identical plan — ExamplesSpec asserts the plan shape
  * is demuxer-independent, so the swap is a pure function injection.
  * (A JNI libavcodec binding is the lower-overhead production variant —
  * same seam, no process spawn; the CLI edition is the zero-dependency
  * recipe. Reference capability: melt.clj has no media path; this is
  * part of the beyond-reference pipeline surface.)
  */
object FfmpegDemux {

  /** Demux raster: small enough that the gray frame fits one pipe buffer,
    * large enough that scene-level luma structure survives. */
  val W = 32
  val H = 24

  /** The ffmpeg binary, resolved once per JVM from PATH (executor-safe:
    * lazy, no Spark objects). None = not installed; callers fall back to
    * the stub demuxers. */
  lazy val binary: Option[String] = {
    val names = Seq("ffmpeg")
    val dirs = Option(System.getenv("PATH")).getOrElse("")
      .split(java.io.File.pathSeparatorChar).toSeq
    names.flatMap(n => dirs.map(d => new java.io.File(d, n)))
      .find(f => f.isFile && f.canExecute).map(_.getAbsolutePath)
  }

  def available: Boolean = binary.nonEmpty

  /** SigDemux for [[Multimodal.frameSigsWith]] (and so for
    * [[graft.examples.VideoDedupExample.dedupVideos]]'s `sigDemux` seam):
    * container bytes → one [[Multimodal.FrameSig]] per decoded frame,
    * level_sum = Σ gray bytes over the fixed raster. Throws if ffmpeg is
    * absent — gate on [[available]] at graph-build time. */
  def frameSigs(id: Long, payload: Array[Byte])
      : Iterator[Multimodal.FrameSig] = {
    val bin = binary.getOrElse(throw new IllegalStateException(
      "ffmpeg not on PATH — gate on FfmpegDemux.available"))
    // temp file, not pipe:0 — mp4's moov atom commonly trails the mdat,
    // so the demuxer needs SEEKABLE input; a named temp file is the
    // portable answer (tmpfs-backed on real clusters)
    val tmp = java.io.File.createTempFile("graft-ffmpeg-", ".bin")
    try {
      java.nio.file.Files.write(tmp.toPath, payload)
      val cmd = Array(bin, "-v", "error", "-nostdin", "-i",
        tmp.getAbsolutePath, "-f", "rawvideo", "-pix_fmt", "gray",
        "-vf", s"scale=$W:$H", "pipe:1")
      val proc = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(false).start()
      proc.getOutputStream.close()
      // drain stderr concurrently — a chatty error stream must not
      // deadlock the stdout read
      val errDrain = new Thread(() => {
        val buf = new Array[Byte](4096)
        val es = proc.getErrorStream
        try while (es.read(buf) >= 0) () finally es.close()
      })
      errDrain.setDaemon(true)
      errDrain.start()
      val frameBytes = W * H
      val out = proc.getInputStream
      val sigs = scala.collection.mutable.ArrayBuffer
        .empty[Multimodal.FrameSig]
      val buf = new Array[Byte](frameBytes)
      var eof = false
      try {
        while (!eof) {
          var off = 0
          var n = 0
          while (off < frameBytes && n >= 0) {
            n = out.read(buf, off, frameBytes - off)
            if (n > 0) off += n
          }
          if (off == frameBytes) {
            var sum = 0L
            var i = 0
            while (i < frameBytes) { sum += buf(i) & 0xff; i += 1 }
            sigs += Multimodal.FrameSig(id, sigs.length, frameBytes, sum)
          } else eof = true // short read = stream end (trailing partial
          // frames can't occur: rawvideo emits whole rasters)
        }
      } finally out.close()
      val exit = proc.waitFor()
      if (exit != 0 || sigs.isEmpty)
        Iterator.single(Multimodal.FrameSig(id, -1, 0, -1L))
      else sigs.iterator
    } catch {
      case scala.util.control.NonFatal(_) =>
        Iterator.single(Multimodal.FrameSig(id, -1, 0, -1L))
    } finally {
      tmp.delete()
      ()
    }
  }

  /** A pure-JVM YUV4MPEG2 (y4m) encoder for `frames` of WxH luma planes —
    * the generated-clip path the spec uses when ffmpeg IS present: y4m is
    * an uncompressed textbook container every ffmpeg build demuxes, and
    * composing it needs no codec, so the real-CLI edition is testable
    * from bytes this repo synthesizes deterministically. */
  def y4mOf(frames: Seq[Array[Byte]], w: Int = W, h: Int = H)
      : Array[Byte] = {
    require(frames.forall(_.length == w * h), "luma plane size mismatch")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII"))
    val chroma = new Array[Byte]((w / 2) * (h / 2))
    java.util.Arrays.fill(chroma, 128.toByte) // neutral U/V
    frames.foreach { y =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(y)
      bos.write(chroma)
      bos.write(chroma)
    }
    bos.toByteArray
  }
}
