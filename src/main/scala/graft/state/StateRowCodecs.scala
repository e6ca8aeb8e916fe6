package graft.state

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, JoinedRow, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.streaming.state.{KeyStateEncoderSpec, NoPrefixKeyStateEncoderSpec, PrefixKeyScanStateEncoderSpec, RangeKeyScanStateEncoderSpec, StateSchemaMetadataKey, StateSchemaProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Binary codecs between `UnsafeRow` state keys/values and the byte layout
  * stored in RocksDB.
  *
  * The reference stores keys/values as raw `UnsafeRow.getBytes` and rehydrates
  * them with `pointTo` (reference `RocksDbStateStoreProvider.scala:152-162`,
  * `:258-264`). That is our no-prefix layout. Spark 4's SPI additionally
  * requires real prefix scans (`PrefixKeyScanStateEncoderSpec`, used by
  * session windows) and byte-ordered range scans
  * (`RangeKeyScanStateEncoderSpec`, used by transformWithState timers) — the
  * reference's `getRange` ignored its bounds (`:190-193`), which we must not
  * reproduce. Hence three codecs, chosen from the encoder spec.
  */
sealed trait KeyCodec extends Serializable {
  def encode(key: UnsafeRow): Array[Byte]

  /** Rehydrate a full key row. `bytes` must be an array owned by the caller
    * (RocksDB JNI returns fresh arrays), since the row points into it. */
  def decode(bytes: Array[Byte]): UnsafeRow

  def supportsPrefixScan: Boolean = false

  /** A byte string `p` such that the encoding of every key with this logical
    * prefix starts with `p`, and no key without the prefix does. */
  def encodePrefix(prefix: UnsafeRow): Array[Byte] =
    throw new UnsupportedOperationException("prefix scan not supported by this key encoder")
}

object KeyCodec {
  def apply(spec: KeyStateEncoderSpec): KeyCodec = spec match {
    case NoPrefixKeyStateEncoderSpec(keySchema) => new NoPrefixKeyCodec(keySchema.length)
    case PrefixKeyScanStateEncoderSpec(keySchema, n) => new PrefixScanKeyCodec(keySchema, n)
    case RangeKeyScanStateEncoderSpec(keySchema, ordinals) => new RangeScanKeyCodec(keySchema, ordinals)
  }

  private[state] def boundRefs(schema: StructType, from: Int, until: Int): Seq[BoundReference] =
    (from until until).map(i => BoundReference(i, schema(i).dataType, schema(i).nullable))
}

/** Key bytes = raw UnsafeRow bytes; no scan structure. */
final class NoPrefixKeyCodec(numFields: Int) extends KeyCodec {
  override def encode(key: UnsafeRow): Array[Byte] = key.getBytes

  override def decode(bytes: Array[Byte]): UnsafeRow = {
    val row = new UnsafeRow(numFields)
    row.pointTo(bytes, bytes.length)
    row
  }
}

/** Layout: `[4-byte BE prefixLen][prefix UnsafeRow bytes][suffix UnsafeRow bytes]`.
  *
  * All keys sharing the same first `numColsPrefixKey` column values share an
  * identical byte prefix (UnsafeRow layout is deterministic for fixed schema
  * and values), so a RocksDB bounded iterator implements `prefixScan`.
  */
final class PrefixScanKeyCodec(keySchema: StructType, numColsPrefixKey: Int) extends KeyCodec {
  require(numColsPrefixKey > 0 && numColsPrefixKey < keySchema.length)

  @transient private lazy val prefixProj =
    UnsafeProjection.create(KeyCodec.boundRefs(keySchema, 0, numColsPrefixKey))
  @transient private lazy val suffixProj =
    UnsafeProjection.create(KeyCodec.boundRefs(keySchema, numColsPrefixKey, keySchema.length))
  @transient private lazy val restoreProj =
    UnsafeProjection.create(KeyCodec.boundRefs(keySchema, 0, keySchema.length))
  @transient private lazy val joined = new JoinedRow

  private val numSuffixFields = keySchema.length - numColsPrefixKey

  override def supportsPrefixScan: Boolean = true

  override def encode(key: UnsafeRow): Array[Byte] = {
    val p = prefixProj(key)
    val s = suffixProj(key)
    val pLen = p.getSizeInBytes
    val out = new Array[Byte](4 + pLen + s.getSizeInBytes)
    writeBeInt(out, 0, pLen)
    p.writeToMemory(out, Platform.BYTE_ARRAY_OFFSET + 4)
    s.writeToMemory(out, Platform.BYTE_ARRAY_OFFSET + 4 + pLen)
    out
  }

  override def decode(bytes: Array[Byte]): UnsafeRow = {
    val pLen = readBeInt(bytes, 0)
    val prefix = new UnsafeRow(numColsPrefixKey)
    prefix.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + 4, pLen)
    val suffix = new UnsafeRow(numSuffixFields)
    suffix.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + 4 + pLen, bytes.length - 4 - pLen)
    restoreProj(joined(prefix, suffix)).copy()
  }

  override def encodePrefix(prefix: UnsafeRow): Array[Byte] = {
    val pBytes = prefix.getBytes
    val out = new Array[Byte](4 + pBytes.length)
    writeBeInt(out, 0, pBytes.length)
    System.arraycopy(pBytes, 0, out, 4, pBytes.length)
    out
  }

  private def writeBeInt(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >>> 24).toByte; buf(off + 1) = (v >>> 16).toByte
    buf(off + 2) = (v >>> 8).toByte; buf(off + 3) = v.toByte
  }
  private def readBeInt(buf: Array[Byte], off: Int): Int =
    ((buf(off) & 0xff) << 24) | ((buf(off + 1) & 0xff) << 16) |
      ((buf(off + 2) & 0xff) << 8) | (buf(off + 3) & 0xff)
}

/** Layout: `[order-preserving bytes of ordering columns][full key UnsafeRow bytes]`.
  *
  * The ordering section encodes each ordering column as
  * `[null marker][fixed-width big-endian value, sign-adjusted]` so that
  * unsigned byte order over the section equals logical order over the
  * columns (nulls first). RocksDB's native key order then yields a
  * range-ordered `iterator()`, which is what timer/range state consumers
  * require. The full row rides behind the ordering section so decoding is a
  * zero-copy `pointTo`.
  */
final class RangeScanKeyCodec(keySchema: StructType, orderingOrdinals: Seq[Int]) extends KeyCodec {
  require(orderingOrdinals.nonEmpty)

  private val widths: Seq[Int] = orderingOrdinals.map(i => fixedWidth(keySchema(i).dataType))
  private val orderLen: Int = widths.map(_ + 1).sum
  private val numFields = keySchema.length

  private def fixedWidth(dt: DataType): Int = dt match {
    case BooleanType | ByteType => 1
    case ShortType => 2
    case IntegerType | FloatType | DateType => 4
    case LongType | DoubleType | TimestampType | TimestampNTZType => 8
    case other => throw new UnsupportedOperationException(
      s"range scan over column type $other is not supported")
  }

  override def encode(key: UnsafeRow): Array[Byte] = {
    val rowBytes = key.getBytes
    val out = new Array[Byte](orderLen + rowBytes.length)
    writeOrderSection(key, out)
    System.arraycopy(rowBytes, 0, out, orderLen, rowBytes.length)
    out
  }

  private def writeOrderSection(row: UnsafeRow, out: Array[Byte]): Unit = {
    var off = 0
    var i = 0
    while (i < orderingOrdinals.length) {
      val ord = orderingOrdinals(i)
      val w = widths(i)
      if (row.isNullAt(ord)) {
        out(off) = 0x00 // nulls sort first; value bytes stay zero
      } else {
        out(off) = 0x01
        val bits: Long = keySchema(ord).dataType match {
          case BooleanType => if (row.getBoolean(ord)) 1L else 0L
          case ByteType => (row.getByte(ord) ^ 0x80L) & 0xffL
          case ShortType => (row.getShort(ord) ^ 0x8000L) & 0xffffL
          case IntegerType | DateType => (row.getInt(ord) ^ 0x80000000L) & 0xffffffffL
          case LongType | TimestampType | TimestampNTZType => row.getLong(ord) ^ Long.MinValue
          case FloatType =>
            val b = java.lang.Float.floatToIntBits(row.getFloat(ord))
            val adj = if (b < 0) ~b else b ^ Int.MinValue
            adj & 0xffffffffL
          case DoubleType =>
            val b = java.lang.Double.doubleToLongBits(row.getDouble(ord))
            if (b < 0) ~b else b ^ Long.MinValue
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        var j = 0
        while (j < w) {
          out(off + 1 + j) = (bits >>> (8 * (w - 1 - j))).toByte
          j += 1
        }
      }
      off += 1 + w
      i += 1
    }
  }

  override def decode(bytes: Array[Byte]): UnsafeRow = {
    val row = new UnsafeRow(numFields)
    row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + orderLen, bytes.length - orderLen)
    row
  }
}

/** Value-schema evolution per the engine's `stateSchemaProvider` contract:
  * when a schema provider is present, every stored value row is prefixed
  * with the 2-byte schema ID it was written under. Rows read back under a
  * newer schema decode with their original layout and are projected to the
  * current one — resolved BY FIELD NAME, matching the Avro schema-resolution
  * semantics Spark's built-in provider applies under Avro encoding: fields
  * added since read as null, removed fields drop, reordered fields follow
  * their name, type widenings cast. (A renamed field reads as null, exactly
  * as in Avro without aliases; a positional fallback would instead
  * mis-assign every field after a reorder.) So a `transformWithState`
  * query can evolve its value schema across a restart and still read
  * pre-evolution state. (The reference predates the SPI; Spark's built-in
  * provider gets this only with Avro encoding.)
  */
final class ValueSchemaEvolution(
    provider: StateSchemaProvider,
    cfName: String,
    currentSchema: StructType) extends Serializable {

  val currentId: Short = provider.getCurrentStateSchemaId(cfName, isKey = false)

  @transient private lazy val cache =
    scala.collection.mutable.HashMap.empty[Short, (UnsafeProjection, Int)]

  /** Adapt an expression of type `from` to type `to` with Avro-resolution
    * semantics, RECURSIVELY through structs: fields follow their NAME
    * (added = null, removed = dropped, reordered = matched), leaf type
    * changes cast only if they are Avro-permitted WIDENINGS ([[widens]] —
    * narrowing refuses loudly). Recursion matters because the engine NESTS
    * user state classes — a TTL'd value is `(value: <user struct>,
    * ttlExpirationMs)` — so the evolving struct is a FIELD of the stored
    * row, where a flat `Cast(struct, struct)` of differing arity reads
    * past the old struct's end. A null struct stays null rather than
    * becoming a struct of nulls. Anything name-matched but uncastable
    * (e.g. an array element whose own struct shape changed) throws a
    * typed error instead of decoding garbage. */
  private def adapt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      from: DataType, to: DataType): org.apache.spark.sql.catalyst.expressions.Expression =
    if (from == to) e
    else (from, to) match {
      case (f: StructType, t: StructType) =>
        val entries = t.fields.flatMap { tf =>
          val i = f.fields.indexWhere(_.name == tf.name)
          val v: org.apache.spark.sql.catalyst.expressions.Expression =
            if (i < 0) Literal(null, tf.dataType)
            else adapt(
              org.apache.spark.sql.catalyst.expressions.GetStructField(e, i, Some(f(i).name)),
              f(i).dataType, tf.dataType)
          Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(tf.name),
            org.apache.spark.sql.types.StringType), v)
        }
        org.apache.spark.sql.catalyst.expressions.If(
          org.apache.spark.sql.catalyst.expressions.IsNull(e),
          Literal(null, t),
          org.apache.spark.sql.catalyst.expressions.CreateNamedStruct(entries.toIndexedSeq))
      case _ if widens(from, to) => Cast(e, to)
      case _ => throw new UnsupportedOperationException(
        s"state value schema evolution cannot adapt a field of type " +
          s"${from.catalogString} to ${to.catalogString} (column family $cfName)")
    }

  /** The leaf type changes evolution accepts: exactly the WIDENING
    * promotions Avro schema resolution permits (int→long, int/long→
    * float/double, float→double, and their byte/short analogues;
    * string↔binary), recursively through array elements and map entries.
    * `Cast.canCast` is deliberately NOT the gate here: Spark can cast
    * long→int (wraps), double→int (truncates), string→int (nulls) — all
    * "castable", all silent garbage when applied to recovered state.
    * Narrowing or repurposing a state field refuses with the typed error
    * above, matching what Spark's built-in Avro mode does. Structs are
    * excluded — at top level they resolve BY NAME (the case above);
    * inside an array or map a Cast would resolve them positionally,
    * mis-assigning on reorder, so that shape change also refuses. */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => true
    // element nullability may only WIDEN too: stored null elements under a
    // non-null target would bypass the typed refusal into an unresolvable
    // Cast (or a schema that lies about its nulls)
    case (ArrayType(fe, fn), ArrayType(te, tn)) => (!fn || tn) && widens(fe, te)
    case (MapType(fk, fv, fn), MapType(tk, tv, tn)) =>
      (!fn || tn) && widens(fk, tk) && widens(fv, tv)
    case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
    case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
    case (IntegerType, LongType | FloatType | DoubleType) => true
    case (LongType, FloatType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case (StringType, BinaryType) | (BinaryType, StringType) => true
    case _ => false
  }

  /** Projection from the row layout of `oldId` to the current schema:
    * fields resolved by NAME, recursively ([[adapt]]); unmatched fields
    * null. */
  def projectionFor(oldId: Short): (UnsafeProjection, Int) = cache.synchronized {
    cache.getOrElseUpdate(oldId, {
      val oldSchema = provider.getSchemaMetadataValue(
        StateSchemaMetadataKey(cfName, oldId, isKey = false)).sqlSchema
      val exprs = currentSchema.fields.map { f =>
        oldSchema.fields.indexWhere(_.name == f.name) match {
          case -1 => Literal(null, f.dataType): org.apache.spark.sql.catalyst.expressions.Expression
          case i =>
            adapt(BoundReference(i, oldSchema(i).dataType, nullable = true),
              oldSchema(i).dataType, f.dataType)
        }
      }
      (UnsafeProjection.create(exprs.toIndexedSeq), oldSchema.length)
    })
  }
}

/** Value framing. Single-value column families store raw UnsafeRow bytes; a
  * multi-valued family (transformWithState ListState) stores
  * `[4-byte BE len][row bytes]` frames concatenated, appended by `merge`.
  * With schema evolution active, `row bytes` = `[2-byte BE schemaId][row]`.
  */
final class ValueCodec(
    numFields: Int,
    multiValued: Boolean,
    evolution: Option[ValueSchemaEvolution] = None) extends Serializable {

  private def encodeRow(value: UnsafeRow): Array[Byte] = evolution match {
    case None => value.getBytes
    case Some(e) =>
      val v = value.getBytes
      val out = new Array[Byte](2 + v.length)
      out(0) = ((e.currentId >>> 8) & 0xff).toByte; out(1) = (e.currentId & 0xff).toByte
      System.arraycopy(v, 0, out, 2, v.length)
      out
  }

  private def decodeRow(bytes: Array[Byte], off: Int, len: Int): UnsafeRow = evolution match {
    case None =>
      val row = new UnsafeRow(numFields)
      row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + off, len)
      row
    case Some(e) =>
      val id = (((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)).toShort
      if (id == e.currentId) {
        val row = new UnsafeRow(numFields)
        row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + off + 2, len - 2)
        row
      } else {
        val (proj, oldNumFields) = e.projectionFor(id)
        val old = new UnsafeRow(oldNumFields)
        old.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + off + 2, len - 2)
        proj(old).copy() // projection output buffer is reused; detach
      }
  }

  def encodeSingle(value: UnsafeRow): Array[Byte] = encodeRow(value)

  def decodeSingle(bytes: Array[Byte]): UnsafeRow =
    if (bytes == null) null
    else if (multiValued) decodeAll(bytes).next()
    else decodeRow(bytes, 0, bytes.length)

  def encodeFrame(value: UnsafeRow): Array[Byte] = {
    val vBytes = encodeRow(value)
    val out = new Array[Byte](4 + vBytes.length)
    out(0) = (vBytes.length >>> 24).toByte; out(1) = (vBytes.length >>> 16).toByte
    out(2) = (vBytes.length >>> 8).toByte; out(3) = vBytes.length.toByte
    System.arraycopy(vBytes, 0, out, 4, vBytes.length)
    out
  }

  def encodeFrames(values: Array[UnsafeRow]): Array[Byte] = {
    val frames = values.map(encodeFrame)
    val out = new Array[Byte](frames.map(_.length).sum)
    var off = 0
    frames.foreach { f => System.arraycopy(f, 0, out, off, f.length); off += f.length }
    out
  }

  def appendFrame(existing: Array[Byte], value: UnsafeRow): Array[Byte] = {
    val frame = encodeFrame(value)
    if (existing == null) frame
    else {
      val out = new Array[Byte](existing.length + frame.length)
      System.arraycopy(existing, 0, out, 0, existing.length)
      System.arraycopy(frame, 0, out, existing.length, frame.length)
      out
    }
  }

  def decodeAll(bytes: Array[Byte]): Iterator[UnsafeRow] = {
    if (bytes == null) return Iterator.empty
    if (!multiValued) return Iterator.single(decodeSingle(bytes))
    new Iterator[UnsafeRow] {
      private var off = 0
      override def hasNext: Boolean = off < bytes.length
      override def next(): UnsafeRow = {
        val len = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        // decodeRow, not a raw pointTo: with schema evolution active each
        // frame's row bytes carry the 2-byte schema-ID prefix — skipping it
        // here shifted every multi-valued (ListState) row by two bytes.
        val row = decodeRow(bytes, off + 4, len)
        off += 4 + len
        row
      }
    }
  }
}
