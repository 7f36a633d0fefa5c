package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Encoder, Encoders}

/** The dataflow row: one engine-visible string key plus an opaque binary
  * value — the reference's fundamental abstraction (`lrdd.Row`,
  * /root/reference/lrdd/row.go:5-8). Partitioning, grouping and sorting
  * placement all key on `key`; the engine never inspects `value`.
  *
  * On Spark this is a plain product type: Tungsten's UnsafeRow handles
  * the memory discipline the reference implements by hand with
  * `sync.Pool` (/root/reference/lrdd/row_bytes.go:36-47).
  */
final case class KV(key: String, value: Array[Byte]) {
  def valueString: String = new String(value, StandardCharsets.UTF_8)
  def valueLong: Long = java.lang.Long.parseLong(valueString)

  // Array fields get reference equality from the case-class default —
  // two KVs with identical bytes would compare unequal in driver-side
  // Sets/Maps/assertions. Content equality is the row contract.
  override def equals(o: Any): Boolean = o match {
    case KV(k, v) => k == key && java.util.Arrays.equals(v, value)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (if (key == null) 0 else key.hashCode) +
      java.util.Arrays.hashCode(value)
}

object KV {
  implicit val encoder: Encoder[KV] = Encoders.product[KV]

  def of(key: String, value: String): KV =
    KV(key, value.getBytes(StandardCharsets.UTF_8))
  def of(key: String, value: Long): KV = of(key, value.toString)

  /** Conversions mirroring the reference's lrdd.From* helpers
    * (/root/reference/lrdd/from.go:12-103). Values are UTF-8 text —
    * the reference's int helpers also encode decimal strings
    * (/root/reference/lrdd/from.go:56-65).
    */
  def fromStrings(values: String*): Seq[KV] = values.map(v => of("", v))
  def fromStringMap(m: Map[String, String]): Seq[KV] =
    m.toSeq.map { case (k, v) => of(k, v) }
  def fromStringSliceMap(m: Map[String, Seq[String]]): Seq[KV] =
    m.toSeq.flatMap { case (k, vs) => vs.map(v => of(k, v)) }
  def fromInts(values: Int*): Seq[KV] = values.map(v => of("", v.toLong))
  def fromIntSliceMap(m: Map[String, Seq[Int]]): Seq[KV] =
    m.toSeq.flatMap { case (k, vs) => vs.map(v => of(k, v.toLong)) }
}
