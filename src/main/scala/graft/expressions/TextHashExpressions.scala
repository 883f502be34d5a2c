package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: tokenize + shingle-hash + k mins in ONE pass
  * per row, invoked from whole-stage codegen via `StaticInvoke` — no token
  * explode, no window, no aggregate, so the signature stage of MinHash
  * dedup shuffles NOTHING (the relational form shuffles one row per token).
  * Hash family: xxhash64 chaining over token hashes (same primitive Spark's
  * `xxhash64` uses); any 64-bit family preserves MinHash semantics.
  *
  * Returns null for a text with fewer than `shingleN` tokens (no complete
  * shingle — such docs cannot be near-dup candidates).
  */
object MinHashOps {
  def compute(text: UTF8String, shingleN: Int, k: Int): ArrayData = {
    val toks = text.toString.toLowerCase.split("\\s+")
    // count non-empty tokens without allocating a filtered copy
    var nTok = 0
    var i = 0
    while (i < toks.length) { if (toks(i).nonEmpty) nTok += 1; i += 1 }
    if (nTok < shingleN) return null
    val th = new Array[Long](nTok)
    var j = 0
    i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        th(j) = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
        j += 1
      }
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s <= nTok - shingleN) {
      var sh = 42L
      var p = 0
      while (p < shingleN) { sh = XXH64.hashLong(th(s + p), sh); p += 1 }
      var t = 0
      while (t < k) {
        val h = XXH64.hashLong(sh, t.toLong)
        if (h < mins(t)) mins(t) = h
        t += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

object TextHashExpressions {
  /** `array<bigint>` of k MinHash values for `text`, or null below
    * `shingleN` tokens. One static call per row inside codegen.
    */
  def minHashSignature(text: Column, shingleN: Int, k: Int): Column =
    GraftBridge.column(StaticInvoke(
      MinHashOps.getClass,
      ArrayType(LongType, containsNull = false),
      "compute",
      Seq(GraftBridge.expression(text), Literal(shingleN), Literal(k)),
      inputTypes = Seq(StringType, IntegerType, IntegerType),
      propagateNull = true,
      returnNullable = true))
}
