package graft.engine

/**
 * Seekable read-only stream over a deduped object (reference:
 * src/DedupeLibrary/DedupeStream.cs:13-175). Holds only the object map in
 * memory; chunk payloads are fetched on demand through `fetch` and the
 * current chunk is cached, so sequential reads fetch each chunk exactly
 * once and random access fetches only the covering chunk.
 */
final class DedupeObjectStream(
    val length: Long,
    map: Seq[MapRow],
    fetch: String => Array[Byte]) extends java.io.InputStream {

  private var pos: Long = 0L
  private var cachedKey: String = _
  private var cachedData: Array[Byte] = _
  private var cachedStart: Long = -1L

  def position: Long = pos

  /** Seek to any offset in [0, length] (position == length reads EOF). */
  def seek(offset: Long): Unit = {
    require(offset >= 0 && offset <= length, s"seek out of range: $offset not in [0, $length]")
    pos = offset
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (pos >= length) return -1
    // interval-containment lookup (operator C1) over the in-memory map
    val m = map.find(r => r.chunkAddress <= pos && r.chunkAddress + r.chunkLength > pos)
      .getOrElse(throw new IllegalStateException(s"no chunk covers position $pos"))
    if (cachedStart != m.chunkAddress || cachedKey != m.chunkKey) {
      cachedData = fetch(m.chunkKey)
      cachedKey = m.chunkKey
      cachedStart = m.chunkAddress
    }
    val inChunk = (pos - m.chunkAddress).toInt
    val n = math.min(len.toLong, math.min(m.chunkLength - inChunk, length - pos)).toInt
    System.arraycopy(cachedData, inChunk, buf, off, n)
    pos += n
    n
  }

  override def available(): Int = math.min(length - pos, Int.MaxValue.toLong).toInt
}
