package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit semantics of the reusable event-log operators. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("Sessionize: gap strictly greater than gapSeconds starts a new session") {
    val ev = Seq(
      (1L, ts(0), 1L), (1L, ts(100), 2L),
      (1L, ts(100 + 3600), 3L),      // gap == 3600: same session
      (1L, ts(100 + 3600 + 3601), 4L), // gap 3601 > 3600: new session
      (2L, ts(50), 5L))
      .toDF("user_id", "ts", "event_id")
    val got = Sessionize.withSessionNo(ev, "user_id", "ts", "event_id", 3600L)
      .select(col("event_id"), col("session_no")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("Sessionize.sessions aggregates bounds and counts per session") {
    val ev = Seq((1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(8000), 3L))
      .toDF("user_id", "ts", "event_id")
    val got = Sessionize.sessions(ev, "user_id", "ts", "event_id", 3600L)
      .select(col("session_no"), col("session_start"), col("session_end"), col("n_events"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got == Set((1L, ts(0), ts(10), 2L), (2L, ts(8000), ts(8000), 1L)))
  }

  test("AsOfJoin.backward: latest right at-or-before left; same-ts right visible; max tiebreak") {
    val left = Seq((1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(5), "c"), (2L, ts(10), "d"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(10), 100L), (1L, ts(10), 101L), // two at same ts: 101 wins
      (1L, ts(15), 102L))
      .toDF("k", "rts", "payload")
      .withColumn("tie", col("payload"))
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", "tie", Seq("payload"))
      .select(col("tag"), col("asof_payload")).as[(String, Option[Long])].collect().toMap
    assert(got == Map("a" -> Some(101L), "b" -> Some(102L), "c" -> None, "d" -> None))
  }

  test("AsOfJoin.backward: multi-column payload comes from ONE right row, null fields included") {
    // right@1 has (a=1, b=null); right@2 has (a=null, b=2). The as-of row
    // for left@3 is right@2 — the output must be (null, 2), never the
    // per-column stitch (1, 2).
    val left = Seq((1L, ts(3))).toDF("k", "ts")
    val right = Seq(
      (1L, ts(1), Option(1L), Option.empty[Long]),
      (1L, ts(2), Option.empty[Long], Option(2L)))
      .toDF("k", "rts", "a", "b")
      .withColumn("tie", col("rts").cast("long"))
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", "tie", Seq("a", "b"))
      .select(col("asof_a"), col("asof_b")).as[(Option[Long], Option[Long])].head()
    assert(got == ((None, Some(2L))), s"payload must be the latest right ROW, got $got")
  }

  test("AsOfJoin.forward: earliest right at-or-after left; same-ts right visible; MIN tiebreak") {
    val left = Seq((1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(25), "c"), (2L, ts(10), "d"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(10), 100L), (1L, ts(10), 101L), // two at same ts: 100 wins (mirror of backward)
      (1L, ts(22), 102L))
      .toDF("k", "rts", "payload")
      .withColumn("tie", col("payload"))
    val got = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts", "tie", Seq("payload"))
      .select(col("tag"), col("asof_payload")).as[(String, Option[Long])].collect().toMap
    assert(got == Map("a" -> Some(100L), "b" -> Some(102L), "c" -> None, "d" -> None))
  }

  test("AsOfJoin.nearest: closer side wins, equidistant and one-sided fall to backward") {
    val left = Seq(
      (1L, ts(10), "back-closer"),   // back@9 (d=1), fwd@14 (d=4)
      (1L, ts(13), "fwd-closer"),    // back@9 (d=4), fwd@14 (d=1)
      (1L, ts(30), "only-back"),     // nothing after
      (2L, ts(3), "only-fwd"),       // nothing before
      (1L, ts(11), "equidistant"))   // back@9 (d=2), fwd@13? no - right@14 d=3 -> back
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(9), 1L), (1L, ts(14), 2L), (2L, ts(5), 3L))
      .toDF("k", "rts", "payload")
      .withColumn("tie", col("payload"))
    val got = AsOfJoin.nearest(left, right, Seq("k"), "ts", "rts", "tie", Seq("payload"))
      .select(col("tag"), col("asof_payload")).as[(String, Option[Long])].collect().toMap
    assert(got == Map("back-closer" -> Some(1L), "fwd-closer" -> Some(2L),
      "only-back" -> Some(2L), "only-fwd" -> Some(3L), "equidistant" -> Some(1L)))
    // true equidistance: back@9 and fwd@13 from ts(11) -> backward wins
    val right2 = Seq((1L, ts(9), 1L), (1L, ts(13), 2L))
      .toDF("k", "rts", "payload").withColumn("tie", col("payload"))
    val eq = AsOfJoin.nearest(left.filter(col("tag") === "equidistant"),
        right2, Seq("k"), "ts", "rts", "tie", Seq("payload"))
      .select(col("asof_payload")).as[Option[Long]].head()
    assert(eq == Some(1L), "equidistant must fall to backward")
    // both windows ride ONE key exchange
    val plan = AsOfJoin.nearest(left, right, Seq("k"), "ts", "rts", "tie",
      Seq("payload")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("AsOfJoin forward/nearest match a brute-force reference on a randomized log") {
    // pins the r11 frame rewrite (reversed-order running last in place of
    // the following-frame running first) beyond the fixtures: duplicates,
    // shared timestamps across sides, keys missing one side entirely
    val rnd = new scala.util.Random(11)
    val left = (1 to 150).map(i =>
      ((rnd.nextInt(4) + 1).toLong, ts(rnd.nextInt(60).toLong), i.toLong))
    val right = (1 to 120).map(i =>
      ((rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(60).toLong), 1000L + i))
    val leftDf = left.toDF("k", "ts", "lid")
    val rightDf = right.toDF("k", "rts", "payload").withColumn("tie", col("payload"))
    def reference(pickFwd: Boolean): Map[Long, Option[Long]] =
      left.map { case (k, t, lid) =>
        val cands = right.filter(_._1 == k)
        val m =
          if (pickFwd) cands.filter(_._2.getTime >= t.getTime)
            .sortBy(r => (r._2.getTime, r._3)).headOption
          else cands.filter(_._2.getTime <= t.getTime)
            .sortBy(r => (-r._2.getTime, -r._3)).headOption
        lid -> m.map(_._3)
      }.toMap
    val fwd = AsOfJoin.forward(leftDf, rightDf, Seq("k"), "ts", "rts", "tie",
        Seq("payload"))
      .select(col("lid"), col("asof_payload")).as[(Long, Option[Long])]
      .collect().toMap
    assert(fwd == reference(pickFwd = true), "forward diverged from brute force")
    val back = reference(pickFwd = false)
    val nearest = AsOfJoin.nearest(leftDf, rightDf, Seq("k"), "ts", "rts", "tie",
        Seq("payload"))
      .select(col("lid"), col("asof_payload")).as[(Long, Option[Long])]
      .collect().toMap
    val nearestRef = left.map { case (k, t, lid) =>
      val b = back(lid).map(p => right.find(r => r._1 == k && r._3 == p).get._2)
      val f = fwd(lid).map(p => right.find(r => r._1 == k && r._3 == p).get._2)
      lid -> ((b, f) match {
        case (None, None) => None
        case (Some(_), None) => back(lid)
        case (None, Some(_)) => fwd(lid)
        case (Some(bt), Some(ft)) =>
          if (t.getTime - bt.getTime <= ft.getTime - t.getTime) back(lid)
          else fwd(lid)
      })
    }.toMap
    assert(nearest == nearestRef, "nearest diverged from brute force")
  }

  test("Shingles.wordNGrams yields an empty array (not a crash) for inputs shorter than n") {
    import graft.ops.Shingles
    val got = Seq(Seq("a", "b"), Seq("a", "b", "c"))
      .toDF("w")
      .select(Shingles.wordNGrams(col("w"), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq.empty, Seq("a b c")))
  }

  test("StatefulScan: rows arrive key-grouped and ordered; state resets across keys") {
    val ev = (1 to 100).map(i => ((i % 5).toLong, ts(i.toLong), i.toLong))
      .toDF("k", "ts", "id")
    case class R(k: Long, ts: Timestamp, id: Long)
    val ds = ev.as[(Long, Timestamp, Long)]
    val out = StatefulScan.scanPartitions(ds,
      Seq(col("k")), Seq(col("k"), col("ts"), col("id"))) { it =>
      var lastKey = Long.MinValue
      var lastId = Long.MinValue
      it.map { case (k, _, id) =>
        val ordered = if (k == lastKey) id > lastId else true
        lastKey = k; lastId = id
        (k, id, ordered)
      }
    }.collect()
    assert(out.length == 100)
    assert(out.forall(_._3), "every row must see strictly increasing ids within its key run")
  }
}
