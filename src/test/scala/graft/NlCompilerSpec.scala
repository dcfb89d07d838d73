package graft

import graft.functions.NlCompiler
import org.apache.spark.sql.functions._

/** The deterministic NL grammar (SURVEY.md C3): the operation classes
  * observed in the reference's LLM-generated code (example.ipynb). */
class NlCompilerSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    (1, "a", 10.0, "2024-01-03"),
    (2, "a", 30.0, "2024-01-01"),
    (3, "b", 20.0, "2024-01-02"),
    (4, "b", 40.0, "not-a-date")
  ).toDF("id", "grp", "score", "when_str")

  test("top-k with sort desc and projection") {
    val c = NlCompiler.compile("top 2 by score desc showing id and score", df.columns.toSeq)
    val out = c.apply(df).collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(out === Seq((4, 40.0), (2, 30.0)))
  }

  test("unique-by keeps first row after sort (pandas keep='first' contract)") {
    val c = NlCompiler.compile("unique by grp by score desc showing id", df.columns.toSeq)
    assert(c.apply(df).as[Int].collect().toSet === Set(2, 4))
  }

  test("where filter with numeric comparison") {
    val c = NlCompiler.compile("where score > 25 showing id", df.columns.toSeq)
    assert(c.apply(df).as[Int].collect().toSet === Set(2, 4))
  }

  test("date parse nulls on failure (pandas errors='coerce' analogue)") {
    val c = NlCompiler.compile("parse when_str as date", df.columns.toSeq)
    val out = c.apply(df)
    assert(out.schema("when_str").dataType.typeName === "timestamp")
    assert(out.filter(col("when_str").isNull).count() === 1)
  }

  test("column resolution is case-insensitive") {
    val c = NlCompiler.compile("top 1 by SCORE desc showing ID", df.columns.toSeq)
    assert(c.apply(df).columns.toSeq === Seq("id"))
  }

  test("filter literals keep their case (review regression)") {
    val d = Seq((1, "R"), (2, "r"), (3, "N")).toDF("id", "flag")
    val c = NlCompiler.compile("where flag = R showing id", d.columns.toSeq)
    assert(c.apply(d).as[Int].collect().toSeq === Seq(1))
  }

  test("date-like filter values are strings, not a toDouble crash (review regression)") {
    val d = Seq((1, "2024-01-01"), (2, "2024-06-01")).toDF("id", "day")
    val c = NlCompiler.compile("where day >= 2024-03-01 showing id", d.columns.toSeq)
    assert(c.apply(d).as[Int].collect().toSeq === Seq(2))
  }

  test("compiled plan is cached-description stable") {
    val c1 = NlCompiler.compile("top 2 by score desc", df.columns.toSeq)
    val c2 = NlCompiler.compile("top 2 by score desc", df.columns.toSeq)
    assert(c1.describe === c2.describe)
  }

  test("count per group, with post-agg sort and limit on the count") {
    val c = NlCompiler.compile("count per grp by n desc top 1", df.columns.toSeq)
    assert(c.describe.startsWith("groupAgg=count:*->n:by=grp"))
    assert(c.apply(df).as[(String, Long)].collect().toSeq === Seq(("a", 2L)))
  }

  test("sum/avg of a column per group; filters run pre-aggregation") {
    val s = NlCompiler.compile("sum of score per grp", df.columns.toSeq)
    assert(s.apply(df).orderBy("grp").as[(String, Double)].collect().toSeq ===
      Seq(("a", 40.0), ("b", 60.0)))
    val filtered = NlCompiler.compile(
      "where score > 15 average score per grp showing grp and avg_score", df.columns.toSeq)
    assert(filtered.apply(df).orderBy("grp").as[(String, Double)].collect().toSeq ===
      Seq(("a", 30.0), ("b", 30.0)))
    intercept[IllegalArgumentException] {
      NlCompiler.compile("sum per grp", df.columns.toSeq)
    }
  }

  test("grouped top-k: 'top 1 per grp by score' windows, keeps rank, cuts") {
    val c = NlCompiler.compile(
      "top 1 per grp by score desc showing id, grp and rank", df.columns.toSeq)
    assert(c.describe.startsWith("topPerGroup=1:per=grp:order=score:desc"))
    val out = c.apply(df).orderBy("grp")
      .as[(Int, String, Int)].collect().toSeq
    assert(out === Seq((2, "a", 1), (4, "b", 1)))
  }

  test("grouped top-k: within-each phrasing, k=2, filters run pre-window") {
    // the id=4 row is filtered BEFORE ranking, so grp b ranks only 3
    val c = NlCompiler.compile(
      "top 2 within each grp by score desc where score < 35 showing id and rank",
      df.columns.toSeq)
    val out = c.apply(df).orderBy("id").as[(Int, Int)].collect().toSeq
    assert(out === Seq((1, 2), (2, 1), (3, 1)))
  }

  test("rank verb: 'rank by score per grp' keeps every row, no cut") {
    val c = NlCompiler.compile("rank by score asc per grp showing id and rank",
      df.columns.toSeq)
    assert(c.describe.startsWith("topPerGroup=*:per=grp:order=score:asc"))
    val out = c.apply(df).orderBy("id").as[(Int, Int)].collect().toSeq
    assert(out === Seq((1, 1), (2, 2), (3, 1), (4, 2)))
  }

  test("plain 'top k' without a per clause is still a global limit") {
    val c = NlCompiler.compile("top 2 by score desc showing id", df.columns.toSeq)
    assert(c.describe.startsWith("limit=2"))
    assert(c.apply(df).as[Int].collect().toSeq === Seq(4, 2))
  }

  test("running total: per-group prefix sum, ASC-default order, exact longs") {
    val d = Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L), (4L, "a", 1L))
      .toDF("id", "grp", "v")
    val c = NlCompiler.compile(
      "running total of v per grp by id showing id, grp and running_v",
      d.columns.toSeq)
    assert(c.describe.startsWith("runningSum=v->running_v:per=grp:order=id:asc"))
    val out = c.apply(d).orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "a", 10L), (2L, "a", 15L), (3L, "b", 7L), (4L, "a", 16L)))
  }

  test("running total: ungrouped cumulative sum; explicit desc respected") {
    val d = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    val c = NlCompiler.compile("cumulative sum of v by id desc showing id and running_v",
      d.columns.toSeq)
    val out = c.apply(d).orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 22L), (2L, 12L), (3L, 7L)))
  }

  test("running total with NO direction: output order matches the ASC accumulation") {
    // r16 advice regression: the remainder used to recompile through the
    // base path's DESC default, so a direction-free query accumulated
    // chronologically yet EMITTED rows newest-first. The remainder now
    // recompiles with the window's ASC default — one order, both places.
    val d = Seq((3L, 7L), (1L, 10L), (2L, 5L)).toDF("id", "v")
    val c = NlCompiler.compile("running total of v by id showing id and running_v",
      d.columns.toSeq)
    assert(c.describe.contains("order=id:asc"))
    assert(c.describe.contains("orderBy=id:asc"),
      s"remainder sort must inherit the ASC default, got: ${c.describe}")
    // NO re-sort after apply: the emitted order itself is the assertion
    val out = c.apply(d).as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 10L), (2L, 15L), (3L, 22L)))
  }

  test("running total without an order clause fails loudly, never silently") {
    intercept[IllegalArgumentException] {
      NlCompiler.compile("running total of score per grp", df.columns.toSeq)
    }
    // and it is NOT mistaken for the agg grammar's "total ... per ..."
    val agg = NlCompiler.compile("total of score per grp", df.columns.toSeq)
    assert(agg.describe.startsWith("groupAgg=total:score->sum_score"))
  }

  test("share-of-total: one agg + broadcast total; percent verbs scale by 100") {
    val d = Seq(("a", 10L), ("a", 30L), ("b", 40L), ("c", 20L))
      .toDF("grp", "v")
    val c = NlCompiler.compile("share of v per grp by grp asc", d.columns.toSeq)
    assert(c.describe.startsWith("shareOf=v->share_v:by=grp"))
    assert(c.warnings.isEmpty)
    val out = c.apply(d).as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("a", 40L, 0.4), ("b", 40L, 0.4), ("c", 20L, 0.2)))
    // the total rides a broadcast, never a second shuffle of the groups
    val plan = c.apply(d).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    val pc = NlCompiler.compile("percentage of v per grp by grp asc",
      d.columns.toSeq)
    assert(pc.describe.startsWith("shareOf=v->percent_v:by=grp"))
    val pout = pc.apply(d).as[(String, Long, Double)].collect().toSeq
    assert(pout.map(_._3) === Seq(40.0, 40.0, 20.0))
    // pre-agg filter and post-agg clauses compose around the share
    val f = NlCompiler.compile(
      "share of v per grp where v > 15 by share_v desc top 1 showing grp and share_v",
      d.columns.toSeq)
    val fout = f.apply(d).as[(String, Double)].collect().toSeq
    assert(fout === Seq(("b", 0.444444444)))
  }

  test("share-of-total refusals: unresolvable columns and collisions fail loudly") {
    val d = Seq(("a", 10L)).toDF("grp", "v")
    // value column typo: hard error (the whole clause is meaningless)
    intercept[IllegalArgumentException] {
      NlCompiler.compile("share of vv per grp", d.columns.toSeq)
    }
    // no resolvable group: hard error, not a silent global share
    intercept[IllegalArgumentException] {
      NlCompiler.compile("share of v per nope", d.columns.toSeq)
    }
    // partially-resolved group list surfaces a warning (no silent drop)
    val w = NlCompiler.compile("share of v per grp and nope", d.columns.toSeq)
    assert(w.warnings.exists(_.contains("'nope'")))
    // output-name collisions refuse
    intercept[IllegalArgumentException] {
      NlCompiler.compile("share of v per grp",
        d.columns.toSeq :+ "share_v")
    }
    intercept[IllegalArgumentException] {
      NlCompiler.compile("share of v per grp",
        d.columns.toSeq :+ "sum_v")
    }
    // without a per clause the share grammar must NOT fire
    val c = NlCompiler.compile("share of v", d.columns.toSeq)
    assert(!c.describe.contains("shareOf"))
  }

  test("window branches refuse a schema that already has the output column") {
    intercept[IllegalArgumentException] {
      NlCompiler.compile("top 1 per grp by score",
        df.columns.toSeq :+ "rank")
    }
    intercept[IllegalArgumentException] {
      NlCompiler.compile("running total of score per grp by id",
        df.columns.toSeq :+ "running_score")
    }
  }

  private def orders = Seq(
    (100, 1, 10.0), (101, 1, 30.0), (102, 2, 20.0), (103, 9, 99.0)
  ).toDF("order_id", "cust_id", "total")
  private def custs = Seq((1, "ann", "emea"), (2, "bob", "amer"), (3, "cy", "emea"))
    .toDF("cust_id", "cname", "segment")

  test("join with explicit on-key; post-join clauses run on the joined frame") {
    val c = NlCompiler.compileJoin(
      "join with customers on cust_id where segment = emea showing order_id and cname",
      orders.columns.toSeq, custs.columns.toSeq)
    val out = c.apply(orders, custs).orderBy("order_id")
      .as[(Int, String)].collect().toSeq
    assert(out === Seq((100, "ann"), (101, "ann")))
  }

  test("join infers a common *id key when no on-clause is given") {
    val c = NlCompiler.compileJoin("join showing order_id and segment",
      orders.columns.toSeq, custs.columns.toSeq)
    assert(c.describe.startsWith("join=inner:cust_id=cust_id"))
    val out = c.apply(orders, custs)
    // the clause keyword right after "join" must survive (review
    // regression: the old table-name token swallowed it)
    assert(out.columns.toSeq === Seq("order_id", "segment"))
    assert(out.count() === 3)
  }

  test("clause directly after bare join is not eaten as a table name") {
    val c = NlCompiler.compileJoin("join where segment = emea showing order_id",
      orders.columns.toSeq, custs.columns.toSeq)
    val out = c.apply(orders, custs)
    assert(out.columns.toSeq === Seq("order_id"))
    assert(out.as[Int].collect().sorted.toSeq === Seq(100, 101))
  }

  test("filter on the aggregate output acts as HAVING") {
    val c = NlCompiler.compile("count per cust_id where n >= 2 showing cust_id and n",
      orders.columns.toSeq)
    assert(c.apply(orders).as[(Int, Long)].collect().toSeq === Seq((1, 2L)))
  }

  test("left/semi/anti join types; semi keeps left columns only") {
    val left = NlCompiler.compileJoin("left join on cust_id showing order_id and cname",
      orders.columns.toSeq, custs.columns.toSeq)
    val lrows = left.apply(orders, custs).orderBy("order_id")
      .as[(Int, Option[String])].collect().toSeq
    assert(lrows === Seq((100, Some("ann")), (101, Some("ann")),
      (102, Some("bob")), (103, None)))
    val anti = NlCompiler.compileJoin("anti join on cust_id",
      orders.columns.toSeq, custs.columns.toSeq)
    val a = anti.apply(orders, custs)
    // using-column joins surface the key first; same column SET as the left
    assert(a.columns.toSet === orders.columns.toSet)
    assert(a.select("order_id").as[Int].collect().toSeq === Seq(103))
  }

  test("join keys with different names resolve left/right independently") {
    val c2 = custs.withColumnRenamed("cust_id", "customer_id")
    val c = NlCompiler.compileJoin("join on cust_id = customer_id showing order_id, cname",
      orders.columns.toSeq, c2.columns.toSeq)
    assert(c.apply(orders, c2).count() === 3)
  }

  test("sort clause survives a following top/select keyword (review regression)") {
    val c = NlCompiler.compile("by score top 2 showing id", df.columns.toSeq)
    assert(c.describe.contains("orderBy=score:desc") && c.warnings.isEmpty)
    assert(c.apply(df).as[Int].collect().toSeq === Seq(4, 2))
  }

  test("clauses that parse but do not resolve surface as warnings") {
    val c = NlCompiler.compile("top 5 where salry > 100 by scoar desc showing id",
      df.columns.toSeq)
    assert(c.warnings.exists(_.contains("salry")))
    assert(c.warnings.exists(_.contains("scoar")))
  }

  test("right join with differently-named keys keeps unmatched right keys (coalesce)") {
    val c2 = custs.withColumnRenamed("cust_id", "customer_id")
    val c = NlCompiler.compileJoin("right join on cust_id = customer_id",
      orders.columns.toSeq, c2.columns.toSeq)
    val out = c.apply(orders, c2)
    // customer 3 has no orders; its key must survive under the left name
    assert(out.filter(col("cname") === "cy").select("cust_id").as[Int]
      .collect().toSeq === Seq(3))
  }

  test("duplicate non-key columns keep the left copy; post-clauses are unambiguous") {
    val rightWithDup = custs.withColumn("total", lit(-1.0)) // clashes with orders.total
    val c = NlCompiler.compileJoin("join on cust_id where total > 15 showing order_id",
      orders.columns.toSeq, rightWithDup.columns.toSeq)
    assert(c.describe.contains("dropRightDups=total"))
    // left totals filtered (not the right's -1.0): orders 101 (30.0), 102 (20.0)
    assert(c.apply(orders, rightWithDup).as[Int].collect().sorted.toSeq === Seq(101, 102))
  }

  test("date parse runs before the aggregation (agg-branch review regression)") {
    val d = Seq(("u1", "2024-01-05"), ("u1", "not-a-date"), ("u2", "2024-02-01"))
      .toDF("user", "ts")
    val c = NlCompiler.compile("parse ts as date count per user where ts is not null",
      d.columns.toSeq)
    assert(c.describe.contains("toTimestamp=ts"))
    // the malformed date coerces to null BEFORE the filter and the count
    assert(c.apply(d).orderBy("user").as[(String, Long)].collect().toSeq ===
      Seq(("u1", 1L), ("u2", 1L)))
  }

  test("is-null filter does not swallow the following clause keyword (review regression)") {
    val d = Seq(("u1", Some(1.0)), ("u1", None), ("u2", Some(2.0)), ("u2", Some(3.0)))
      .toDF("user", "v")
    // "by" after "is not null" must survive as the sort clause in the
    // agg remainder, not be eaten as the filter's value
    val c = NlCompiler.compile("count per user where v is not null by n desc",
      d.columns.toSeq)
    assert(c.describe.contains("orderBy=n:desc"), c.describe)
    assert(c.apply(d).as[(String, Long)].collect().toSeq ===
      Seq(("u2", 2L), ("u1", 1L)))
  }

  test("right join coalesces duplicate non-key columns for unmatched rows") {
    val rightWithDup = custs.withColumn("total", lit(500.0))
    val c = NlCompiler.compileJoin("right join on cust_id showing cname and total",
      orders.columns.toSeq, rightWithDup.columns.toSeq)
    val out = c.apply(orders, rightWithDup).orderBy("cname")
      .as[(String, Double)].collect().toSeq
    // cy has no orders: the RIGHT side's total must survive, not null
    assert(out.contains(("cy", 500.0)))
    // matched rows keep the LEFT total
    assert(out.filter(_._1 == "ann").map(_._2).toSet === Set(10.0, 30.0))
  }

  test("multi-key sort: 'by k1 asc, k2 desc' orders by both keys") {
    val c = NlCompiler.compile("by grp asc, score desc showing id", df.columns.toSeq)
    assert(c.describe.contains("orderBy=grp:asc") && c.describe.contains("orderBy=score:desc"),
      c.describe)
    assert(c.apply(df).as[Int].collect().toSeq === Seq(2, 1, 4, 3))
  }

  test("multi-key sort accepts 'and' as the key separator") {
    val c = NlCompiler.compile("top 3 by grp and score showing id", df.columns.toSeq)
    // desc default for both keys: b before a, high score first
    assert(c.apply(df).as[Int].collect().toSeq === Seq(4, 3, 2))
  }

  test("agg group list does not swallow a following clause keyword ('and top 5')") {
    val c = NlCompiler.compile("count per grp and top 1", df.columns.toSeq)
    assert(c.describe.contains("by=grp") && !c.describe.contains("top"), c.describe)
    assert(c.describe.contains("limit=1"), c.describe)
    assert(c.warnings.isEmpty, c.warnings.mkString("; "))
    assert(c.apply(df).count() === 1)
  }

  test("unresolved agg group token surfaces a warning, not a silent drop") {
    val c = NlCompiler.compile("count per grp and bogus", df.columns.toSeq)
    assert(c.warnings.exists(_.contains("bogus")), c.warnings.mkString("; "))
  }

  test("ambiguous prefix-stripped token resolves to NOTHING, not schema order") {
    val cols = Seq("unit_price", "total_price", "id")
    val c = NlCompiler.compile("by price showing id", cols)
    // both *_price columns match bare "price" after prefix-stripping —
    // binding to whichever the schema lists first would silently rewrite
    // the query; strict consumers must see the warning instead
    assert(c.warnings.exists(_.contains("price")), c.warnings.mkString("; "))
    assert(!c.describe.contains("orderBy"), c.describe)
  }

  test("space-separated column phrase resolves against a prefixed column") {
    val d = Seq((1, 30.0), (2, 10.0)).toDF("o_orderkey", "o_totalprice")
    val c = NlCompiler.compile("top 1 by total price showing o_orderkey", d.columns.toSeq)
    assert(c.warnings.isEmpty, c.warnings.mkString("; "))
    assert(c.apply(d).as[Int].collect().toSeq === Seq(1))
  }

  test("deterministic tie-break is capped at MaxTieBreakCols on wide schemas") {
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    val wide = (0 until 20).foldLeft(spark.range(3).toDF("k")) {
      (d, i) => d.withColumn(s"x$i", lit(i))
    }
    val c = NlCompiler.compile("by k desc", wide.columns.toSeq)
    val orderLens = c.apply(wide).queryExecution.analyzed.collect {
      case s: Sort => s.order.length
    }
    assert(orderLens.nonEmpty)
    assert(orderLens.forall(_ <= 1 + NlCompiler.MaxTieBreakCols),
      s"sort key widths: $orderLens")
  }

  test("NL filler words in a projection do not fail strict consumers") {
    val c = NlCompiler.compile("show me the id where score > 25", df.columns.toSeq)
    assert(c.warnings.isEmpty, c.warnings.mkString("; "))
    assert(c.apply(df).columns.toSeq === Seq("id"))
  }

  test("MagicTable.joinWithQuery records lineage from both tables") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_nljoin_wh").toString
    val graph = new graft.core.TableGraph(tmp)
    val mo = graft.core.MagicTable.fromDataFrame(orders, "orders_t", graph)
    val mc = new graft.core.MagicTable(custs, "custs_t",
      Seq(graft.sources.ApiSource("http://api/custs")), graph)
    val out = mo.joinWithQuery(mc, "left join on cust_id showing order_id and cname")
    assert(out.name === "orders_t_join_custs_t")
    assert(out.count() === 4)
    assert(out.sources.exists(_.getIdentifier === "http://api/custs"))
  }
}
