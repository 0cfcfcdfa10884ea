package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, SeqOps}
import graft.sources.Tables
import graft.plans.GraftExtensions

/** Semantic invariants for the round-4 sequence/corpus operators
  * (q67–q73) — properties the hash oracle can't state directly, checked
  * on sf0.001 so a future rewrite can't silently weaken semantics while
  * still matching a weaker oracle.
  */
class SeqCorpusOpsSpec extends SparkSpec {
  GraftExtensions.register(spark)
  import spark.implicits._

  test("q67 funnel stages are monotone and stage equals the flag sum") {
    val rows = SeqOps.q67FunnelStages(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p, st) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p <= c && c <= v, s"funnel not monotone: $r")
      assert(st == v + c + p)
    }
    // at least one user must have completed the funnel on this data
    assert(rows.exists(_.getLong(4) == 3L))
  }

  test("q67 click counts only after a view, purchase only after such a click") {
    // independent slow check: per user, scan events chronologically
    val byUser = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .collect().groupBy(_.getLong(0))
    val expected = byUser.map { case (u, evs) =>
      var (f1, f2, f3) = (0L, 0L, 0L)
      evs.sortBy(r => (r.getLong(1), r.getLong(2))).foreach { r =>
        r.getString(3) match {
          case "view" => f1 = 1
          case "click" => if (f1 == 1) f2 = 1
          case "purchase" => if (f2 == 1) f3 = 1
          case _ =>
        }
      }
      u -> (f1, f2, f3)
    }
    SeqOps.q67FunnelStages(spark, sf).collect().foreach { r =>
      assert(expected(r.getLong(0)) == ((r.getLong(1), r.getLong(2), r.getLong(3))),
        s"funnel flags diverge from sequential scan for user ${r.getLong(0)}")
    }
  }

  test("q68 gap fill yields a contiguous hour grid with carried counts") {
    val rows = SeqOps.q68GapFill(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val hours = rs.map(_.getLong(1))
      assert(hours.toSeq == (hours.min to hours.max).toSeq,
        s"user $u grid not contiguous")
      // first and last grid hour are active by construction
      assert(rs.head.getLong(2) > 0 && rs.last.getLong(2) > 0)
      // carry_n is the last active count at or before each row
      var carry = 0L
      rs.foreach { r =>
        if (r.getLong(2) > 0) carry = r.getLong(2)
        assert(r.getLong(3) == carry, s"carry_n wrong at user $u hour ${r.getLong(1)}")
      }
    }
    // gap filling must actually add zero rows on this data
    assert(rows.exists(_.getLong(2) == 0L), "no gaps filled — test data degenerate?")
  }

  test("q69 hopping windows count every event exactly 4 times") {
    val total = SeqOps.q69HoppingWindow(spark, sf)
      .agg(sum($"n")).as[Long].head()
    val events = Tables.events(spark, sf).count()
    assert(total == 4 * events)
  }

  test("q69 window starts are 15-minute-aligned and each event's 4 windows cover it") {
    val starts = SeqOps.q69HoppingWindow(spark, sf)
      .select($"win_start_us").distinct().as[Long].collect().sorted
    assert(starts.nonEmpty && starts.forall(_ % 900000000L == 0))
    // every event timestamp falls inside [start, start+1h) of 4 windows
    val sset = starts.toSet
    Tables.events(spark, sf).select(unix_micros($"ts")).as[Long].collect().foreach { us =>
      val covering = (0L to 3L).map(k => (us / 900000000L - k) * 900000000L)
      assert(covering.forall(st => us >= st && us < st + 3600000000L))
      assert(covering.forall(sset.contains))
    }
  }

  test("q70 flagged outliers match a double-precision z-score check") {
    val flagged = SeqOps.q70ZscoreOutliers(spark, sf)
      .select($"event_id").as[Long].collect().toSet
    val evs = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value").collect()
    val byType = evs.groupBy(_.getString(1))
    val expect = byType.toSeq.flatMap { case (_, rs) =>
      val vs = rs.map(r => math.floor(r.getDouble(2) * 1e6))
      val n = vs.length.toDouble
      val mean = vs.sum / n
      val variance = vs.map(v => (v - mean) * (v - mean)).sum / n
      rs.zip(vs).collect { case (r, v) if (v - mean) * (v - mean) > 4 * variance => r.getLong(0) }
    }.toSet
    // double roundoff could flip a borderline case; allow none here because
    // sf0.001 values sit far from the 2σ boundary — equality must hold
    assert(flagged == expect)
  }

  test("q71 repetition signals: bounds and exact recomputation") {
    val rows = CorpusOps.q71RepetitionSignals(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val (id, nt, nd, nb, ndb, dtp, dbp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nd <= nt && ndb <= nb.max(0))
      assert(dtp >= 0 && dtp <= 1000000 && dbp >= 0 && dbp <= 1000000)
      // recompute exactly from the raw text with the pipeline tokenizer
      val toks = texts(id).trim.toLowerCase.split("\\s+", -1).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      assert(nt == toks.size && nd == toks.distinct.size)
      assert(nb == bigrams.size && ndb == bigrams.distinct.size,
        s"doc $id bigram counts diverge (hash collision or kernel drift)")
    }
  }

  test("q72 top trigrams agree with a direct recount") {
    val got = CorpusOps.q72NgramTopk(spark, sf)
      .as[(String, Long)].collect().toSeq
    val texts = Tables.documents(spark, sf).select($"text").as[String].collect()
    val df = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      t.trim.toLowerCase.split("\\s+", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet[String]
        .foreach(g => df(g) = df.getOrElse(g, 0L) + 1)
    }
    val expect = df.toSeq.sortBy { case (g, n) => (-n, g) }.take(25)
    assert(got == expect)
  }

  test("q73 scrub removes stopwords and collapses runs") {
    val rows = CorpusOps.q73TextScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, nk, nc, clean) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(nc <= nk && nk <= nt)
      val out = if (clean.isEmpty) Seq.empty else clean.split(" ", -1).toSeq
      assert(out.size == nc)
      assert(!out.exists(t => t == "a" || t == "the"), s"stopword survived: $clean")
      assert(out.sliding(2).forall(p => p.size < 2 || p(0) != p(1)),
        s"consecutive duplicate survived: $clean")
    }
    // the corpus contains 'a'/'the' so the scrub must remove something
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("q103 exact-k sample is stable: later-hashed arrivals never perturb it") {
    import org.apache.spark.sql.functions._
    def sample(dir: String) =
      graft.operators.CorpusOps.q103ExactKSample(spark, dir)
        .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    def write(dir: String, ids: Seq[Long]): Unit =
      ids.map(i => (i, s"doc $i", "en", "web", 100L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def hkey(i: Long): Long = (i % 1000003L) * 2654435761L % 1000000007L

    val base = (1L to 40L)
    val dir1 = java.nio.file.Files.createTempDirectory("graft_q103a").toString
    write(dir1, base)
    val s1 = sample(dir1)
    assert(s1.size == 5)

    // a newcomer hashing AFTER every current sample member must not
    // change the sample; one hashing before must enter it
    val maxSampleKey = s1.map(p => hkey(p._2)).max
    val later = (100L to 400L).find(i => hkey(i) > maxSampleKey).get
    val dir2 = java.nio.file.Files.createTempDirectory("graft_q103b").toString
    write(dir2, base :+ later)
    assert(sample(dir2) == s1, "later-hashed arrival must not perturb the sample")

    val earlier = (100L to 4000L).find(i => hkey(i) < s1.map(p => hkey(p._2)).min).get
    val dir3 = java.nio.file.Files.createTempDirectory("graft_q103c").toString
    write(dir3, base :+ earlier)
    val s3 = sample(dir3)
    assert(s3.contains(("web", earlier)) && s3.size == 5)
  }
}
