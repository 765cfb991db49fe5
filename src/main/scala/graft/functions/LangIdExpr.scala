package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the n-gram/marker language-ID heuristic
  * (SURVEY §4.2 preference order (b)). The Column formulation
  * (`TextAnalysis.langId`) runs four interpreted higher-order array
  * filters plus a regexp pass per row — five traversals and five
  * intermediate allocations; higher-order functions never enter
  * whole-stage codegen. This expression classifies in ONE fused scan
  * (single tokenizer walk with a disjoint marker→language lookup, single
  * code-point walk for the CJK charset ratio) and participates in
  * codegen, so a corpus-wide language partition stays pipeline-local.
  *
  * Decision logic is integer-only and IDENTICAL to `TextAnalysis.langId`
  * and the DuckDB oracle CASE — no float parity concerns. One contract
  * difference: a NULL text yields NULL here (standard expression
  * semantics), where the when-chain's fallthrough yields 'en'.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_langid expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_langid"

  override def nullSafeEval(input: Any): Any =
    LangIdExpr.classify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder on the companion class keeps janino happy
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdExpr.classify($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpr {

  // marker -> language index; the per-language marker sets
  // (TextAnalysis.profiles) are disjoint, so ONE lookup decides a token
  private val markerLang: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Seq("en" -> 0, "de" -> 1, "es" -> 2, "fr" -> 3).foreach { case (lang, i) =>
      graft.ext.TextAnalysis.profiles(lang).foreach { w =>
        // the one-lookup design is only valid while the profiles stay
        // disjoint; fail at class init (not with silently skewed counts)
        // if a future profile edit introduces an overlap
        val prev = m.put(w, i)
        require(prev == null,
          s"LangIdExpr marker '$w' appears in two language profiles " +
            s"(${Seq("en", "de", "es", "fr")(prev)} and $lang); the " +
            "single-lookup classifier requires disjoint marker sets")
      }
    }
    m
  }

  private val Langs: Array[UTF8String] =
    Array("zh", "de", "es", "fr", "en").map(UTF8String.fromString)

  /** One-pass classification; same decision table as TextAnalysis.langId. */
  def classify(u: UTF8String): UTF8String = {
    val s = u.toString
    val len = s.length
    val counts = new Array[Int](4) // en, de, es, fr
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) {
          val lang = markerLang.get(s.substring(start, i))
          if (lang != null) counts(lang.intValue()) += 1
        }
        start = i + 1
      }
      i += 1
    }
    // CJK chars and total length in CODE POINTS (SQL length() semantics)
    var cjk = 0
    var cp = 0
    var j = 0
    while (j < len) {
      val c = s.codePointAt(j)
      cp += 1
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      j += Character.charCount(c)
    }
    val cEn = counts(0); val cDe = counts(1)
    val cEs = counts(2); val cFr = counts(3)
    if (cjk * 10 >= cp * 3) Langs(0)
    else if (cDe > cEn && cDe > cEs && cDe > cFr) Langs(1)
    else if (cEs > cEn && cEs > cFr) Langs(2)
    else if (cFr > cEn) Langs(3)
    else Langs(4)
  }
}
