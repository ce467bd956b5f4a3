package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X39 — integer-exact multinomial Naive Bayes (graft.ext.NaiveBayes),
 * pinned against an independent plain-Scala reference that evaluates
 * the DENSE published formula (every feature of every class, Laplace
 * add-one, digit-count log₂) — no Spark, no algebraic hit-sum split, so
 * the operator's only-join-the-hits decomposition is what's under test. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // Controlled corpus: "en" docs lean on (the, cat); "fr" docs on (le,
  // chat); "shared" appears in both classes; doc 40 is pure tie bait
  // (only unseen tokens); doc 50 repeats one token (tf > 1 matters).
  private val train = Seq(
    (0L, "the cat sat shared", "en"),
    (1L, "the the cat shared", "en"),
    (2L, "le chat assis shared", "fr"),
    (3L, "le le chat dort", "fr")
  ).toDF("doc_id", "text", "lang")
  private val testDocs = Seq(
    (10L, "the cat"),          // clearly en
    (20L, "le chat"),          // clearly fr
    (30L, "shared shared"),    // both classes know it
    (40L, "zzz qqq"),          // fully unseen: prior + floor decides
    (50L, "the the the le")    // tf-weighted mix
  ).toDF("doc_id", "text")

  private def tokenHash(s: String): Long = {
    val pows = Seq.iterate(1L, 8)(_ * 131L)
    val core = pows.zipWithIndex.map { case (p, i) =>
      (if (i < s.length) s.charAt(i).toLong else 0L) * p
    }.sum
    (core + (if (s.nonEmpty) s.last.toLong else 0L) * 1000003L + s.length.toLong * 7L) % Dedup.P
  }
  private def bitlen(x: Long): Long = (64 - java.lang.Long.numberOfLeadingZeros(x)).toLong

  /** Dense reference: per-class surprisal over EVERY document feature,
   * pruning applied by dropping features below the per-class top-V cut. */
  private def reference(vocabPerClass: Int): Map[Long, (String, Long)] = {
    val trainRows = train.collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1), r.getString(2)))
    val testRows = testDocs.collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val byClass = trainRows.groupBy(_._3)
    val counts: Map[String, Map[Long, Long]] = byClass.map { case (c, rows) =>
      c -> rows.flatMap(_._2).map(tokenHash).groupBy(identity)
        .map { case (h, xs) => h -> xs.size.toLong }
    }
    val pruned: Map[String, Map[Long, Long]] = counts.map { case (c, m) =>
      c -> m.toSeq.sortBy { case (h, n) => (-n, h) }.take(vocabPerClass).toMap
    }
    val v = counts.values.flatMap(_.keys).toSet.size.toLong
    val nDocs = byClass.map { case (c, rows) => c -> rows.length.toLong }
    val nTotal = trainRows.length.toLong
    val tC = byClass.map { case (c, rows) => c -> (rows.map(_._2.length.toLong).sum + v) }
    testRows.map { case (id, toks) =>
      val scored = counts.keys.toSeq.sorted.map { c =>
        val surp = (bitlen(nTotal) - bitlen(nDocs(c))) +
          toks.map { t =>
            val cnt = pruned(c).getOrElse(tokenHash(t), 0L)
            bitlen(tC(c)) - bitlen(cnt + 1L)
          }.sum
        (c, surp)
      }
      id -> scored.minBy { case (c, s) => (s, c) }
    }.toMap
  }

  private def run(vocabPerClass: Int): Map[Long, (String, Long)] = {
    val m = NaiveBayes.train(train, "doc_id", "text", "lang", vocabPerClass)
    NaiveBayes.classify(testDocs, m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  test("predictions and surprisals match the dense reference (unpruned)") {
    assert(run(1000) == reference(1000))
  }

  test("pruning to top-1 feature per class still matches the reference") {
    assert(run(1) == reference(1))
  }

  test("clear-signal docs classify as expected; ties break label-ascending") {
    val got = run(1000)
    assert(got(10L)._1 == "en")
    assert(got(20L)._1 == "fr")
    // doc 40 has only unseen tokens: both classes score prior + dl·floor;
    // en and fr have equal priors and equal T_c here iff token totals
    // match — assert agreement with the reference rather than a guess,
    // but pin that the WINNER is the lexicographically first among the
    // minimal-surprisal classes.
    val ref = reference(1000)
    val minSurp = ref(40L)._2
    assert(got(40L) == ref(40L))
    assert(got(40L)._2 == minSurp)
  }

  test("model feat table is the per-class top-V by (count desc, hash asc)") {
    val m = NaiveBayes.train(train, "doc_id", "text", "lang", 2)
    val feat = m.feat.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(feat.count(_._1 == "en") == 2 && feat.count(_._1 == "fr") == 2)
    // en: "the" has 3 instances (top); fr: "le" has 3 (top)
    val enTop = feat.filter(_._1 == "en").maxBy(_._3)
    val frTop = feat.filter(_._1 == "fr").maxBy(_._3)
    assert(enTop._2 == tokenHash("the") && enTop._3 == 3L)
    assert(frTop._2 == tokenHash("le") && frTop._3 == 3L)
  }

  test("plan: model joins broadcast; ranking via native TopKPerKey") {
    val m = NaiveBayes.train(train, "doc_id", "text", "lang", 1000)
    val plan = NaiveBayes.classify(testDocs, m, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"native top-k missing:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"model join not broadcast:\n$plan")
  }
}
