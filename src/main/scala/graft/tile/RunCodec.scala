package graft.tile

import java.nio.{ByteBuffer, ByteOrder}

/** Binary codec for one per-(tile, salt) SORTED run of feature payloads —
  * the unit shuffled by the salted branch's final merge exchange.
  *
  * Why: pv9 moves that exchange from a Catalyst `groupByKey(tile_id)` to
  * an RDD shuffle with a weight-aware partitioner ([[Pyramid]]'s skew
  * fix), and RDD shuffles serialize records with the JVM serializer — an
  * `Array[FeatPayload]` object graph would pay per-object overhead on the
  * fattest keys in the plan. Packing the whole run into one byte blob
  * keeps the shuffle record a `(Long, Array[Byte])` pair, the same
  * flat-bytes discipline [[PayloadCodec]] (pv5) applied to the Catalyst
  * exchange it replaces.
  *
  * Layout (LITTLE_ENDIAN): [n:i32] then per feature, in run order:
  *   [layer_rank:i32][kind_rank:i32][id:i64][blobLen:i32][blob bytes]
  */
object RunCodec {

  def pack(feats: Array[FeatPayload]): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < feats.length) { bytes += 20 + feats(i).blob.length; i += 1 }
    val bb = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(feats.length)
    i = 0
    while (i < feats.length) {
      val f = feats(i)
      bb.putInt(f.layer_rank)
      bb.putInt(f.kind_rank)
      bb.putLong(f.id)
      bb.putInt(f.blob.length)
      bb.put(f.blob)
      i += 1
    }
    bb.array()
  }

  /** Decode a packed run; `tileId` re-labels the payloads (it is the
    * shuffle key, so it does not travel inside the blob). */
  def unpack(tileId: Long, b: Array[Byte]): Array[FeatPayload] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    val out = new Array[FeatPayload](n)
    var i = 0
    while (i < n) {
      val lr = bb.getInt
      val kr = bb.getInt
      val id = bb.getLong
      val blob = new Array[Byte](bb.getInt)
      bb.get(blob)
      out(i) = FeatPayload(tileId, lr, kr, id, blob)
      i += 1
    }
    out
  }
}
