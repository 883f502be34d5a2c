package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring matching (Aho & Corasick 1975) —
  * the bad-word / blocked-phrase content filter of a crawl pipeline
  * (C4 drops any page containing a term from a published block list;
  * the list has thousands of entries, many of them multi-word phrases,
  * so per-pattern regex passes cost |patterns| scans where the automaton
  * costs ONE). One static call per row from whole-stage codegen, the
  * [[BpeOps]] pattern: the pattern list travels as a single
  * length-prefixed spec literal (`<len>:<chars>` concatenated — no
  * sentinel separators, patterns may contain any character) and the
  * built automaton is memoized per JVM.
  *
  * Match semantics: ALL occurrences, including overlapping ones and
  * patterns nested inside other patterns' matches (the automaton's
  * dict-suffix chain) — text and patterns are matched lowercase under
  * `Locale.ROOT` (locale-INDEPENDENT, matching the ROOT-lowercased
  * pattern side and the oracle's `lower()`; a default-locale fold
  * would silently unmatch under e.g. tr_TR's dotless-ı mapping).
  */
object BlocklistOps {

  /** Goto/fail/dict-link automaton. Nodes are dense ints; edges live in
    * per-node hash maps (pattern alphabets are unbounded Unicode).
    * `terminal(n)` is the pattern id ending exactly at `n` (-1 if none;
    * duplicate patterns keep the first id), `dict(n)` the nearest
    * fail-ancestor that is terminal — counting walks that chain, so a
    * position reports every pattern ending there.
    */
  final class Automaton(patterns: Array[String]) {
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    private val termBuf = scala.collection.mutable.ArrayBuffer(-1)
    locally {
      var p = 0
      while (p < patterns.length) {
        val pat = patterns(p)
        var node = 0
        var i = 0
        while (i < pat.length) {
          val c = Character.valueOf(pat.charAt(i))
          var nxt = gotoMaps(node).get(c)
          if (nxt == null) {
            gotoMaps += new java.util.HashMap[Character, Integer]()
            termBuf += -1
            nxt = Integer.valueOf(gotoMaps.length - 1)
            gotoMaps(node).put(c, nxt)
          }
          node = nxt.intValue()
          i += 1
        }
        if (termBuf(node) < 0) termBuf(node) = p
        p += 1
      }
    }
    val terminal: Array[Int] = termBuf.toArray
    val fail: Array[Int] = new Array[Int](gotoMaps.length)
    val dict: Array[Int] = new Array[Int](gotoMaps.length)
    locally {
      val queue = new java.util.ArrayDeque[Integer]()
      gotoMaps(0).values().forEach { n =>
        fail(n.intValue()) = 0
        dict(n.intValue()) = 0
        queue.add(n)
      }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        dict(u) = if (terminal(fail(u)) >= 0) fail(u) else dict(fail(u))
        gotoMaps(u).forEach { (c, v) =>
          // compute v's fail by walking u's fail chain
          var f = fail(u)
          var fNext = gotoMaps(f).get(c)
          while (fNext == null && f != 0) {
            f = fail(f)
            fNext = gotoMaps(f).get(c)
          }
          fail(v.intValue()) =
            if (fNext == null || fNext.intValue() == v.intValue()) 0
            else fNext.intValue()
          queue.add(v)
        }
      }
    }

    /** Next state from `node` on character `c`. */
    def step(node: Int, c: Char): Int = {
      val ch = Character.valueOf(c)
      var n = node
      var nxt = gotoMaps(n).get(ch)
      while (nxt == null && n != 0) {
        n = fail(n)
        nxt = gotoMaps(n).get(ch)
      }
      if (nxt == null) 0 else nxt.intValue()
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Automaton]()

  private[graft] def encodePattern(p: String): String = s"${p.length}:$p"

  private def parse(spec: String): Automaton =
    cache.computeIfAbsent(spec, s => {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < s.length) {
        val colon = s.indexOf(':', i)
        val len = s.substring(i, colon).toInt
        out += s.substring(colon + 1, colon + 1 + len)
        i = colon + 1 + len
      }
      new Automaton(out.result())
    })

  /** Total number of pattern occurrences in `text` (all occurrences,
    * overlapping included).
    */
  def countMatches(text: UTF8String, spec: UTF8String): java.lang.Long = {
    val ac = parse(spec.toString)
    // Locale.ROOT, matching the ROOT-lowercased patterns and the oracle's
    // locale-independent lower(): UTF8String.toLowerCase falls back to
    // the JVM DEFAULT locale on non-ASCII rows, where tr_TR would map
    // 'I' to dotless-ı and silently unmatch "casino" (code-review r10)
    val t = text.toString.toLowerCase(java.util.Locale.ROOT)
    var node = 0
    var total = 0L
    var i = 0
    while (i < t.length) {
      node = ac.step(node, t.charAt(i))
      var d = if (ac.terminal(node) >= 0) node else ac.dict(node)
      while (d != 0) {
        total += 1L
        d = ac.dict(d)
      }
      i += 1
    }
    total
  }

  /** Ascending distinct ids of the patterns occurring in `text`. */
  def matchedIds(text: UTF8String, spec: UTF8String): ArrayData = {
    val ac = parse(spec.toString)
    val t = text.toString.toLowerCase(java.util.Locale.ROOT)
    val seen = new java.util.TreeSet[Integer]()
    var node = 0
    var i = 0
    while (i < t.length) {
      node = ac.step(node, t.charAt(i))
      var d = if (ac.terminal(node) >= 0) node else ac.dict(node)
      while (d != 0) {
        seen.add(Integer.valueOf(ac.terminal(d)))
        d = ac.dict(d)
      }
      i += 1
    }
    val out = new Array[Int](seen.size())
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = it.next().intValue(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Column builders for [[BlocklistOps]]. */
object BlocklistExpressions {

  private def spec(patterns: Array[String]): String =
    patterns.map(BlocklistOps.encodePattern).mkString

  /** Total all-occurrence match count of `patterns` in `text`. */
  def blockedTermCount(text: Column, patterns: Array[String]): Column =
    GraftBridge.column(StaticInvoke(
      BlocklistOps.getClass,
      LongType,
      "countMatches",
      Seq(GraftBridge.expression(text),
        Literal(UTF8String.fromString(spec(patterns)), StringType)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))

  /** Ascending distinct matched pattern ids (`array<int>`). */
  def blockedTermIds(text: Column, patterns: Array[String]): Column =
    GraftBridge.column(StaticInvoke(
      BlocklistOps.getClass,
      ArrayType(IntegerType, containsNull = false),
      "matchedIds",
      Seq(GraftBridge.expression(text),
        Literal(UTF8String.fromString(spec(patterns)), StringType)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = true))
}
