package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/**
 * Static codec kernels called from generated code (CodecExpressions) —
 * a top-level Scala object compiles with static forwarders, so
 * whole-stage codegen can invoke `graft.functions.Codecs.gzip(...)`
 * directly with no UDF encoder round trip.
 */
object Codecs {
  def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }

  def gunzip(b: Array[Byte]): Array[Byte] =
    new GZIPInputStream(new ByteArrayInputStream(b)).readAllBytes()

  /** null on corrupt/truncated input (bad magic, CRC, early EOF) — the
    * routable-failure kernel behind GzipTryDecompress. */
  def tryGunzip(b: Array[Byte]): Array[Byte] =
    try gunzip(b) catch { case _: java.io.IOException => null }
}
