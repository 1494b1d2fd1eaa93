package graft

import graft.sources.{HeadlineData, Sinks}

/** Source/sink format round-trips beyond parquet+CSV: ORC and
  * JSON-lines. Both must preserve every row and (for ORC) every
  * type; JSON-lines degrades types by design and must come back
  * intact through an explicit-schema read.
  */
class FormatsSpec extends SparkTestBase {

  private def silver = HeadlineData.silver(spark, sf)

  // nullability is not round-trippable through any file format
  // (readers report nullable); names + types are the contract
  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq

  test("ORC round-trip preserves rows and schema") {
    val dir = tmpDir() + "/orc"
    val in = silver
    Sinks.writeOrc(in, dir)
    val back = spark.read.orc(dir)
    assert(shape(back) == shape(in))
    assert(back.count() == in.count())
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty)
  }

  test("JSON-lines round-trip with explicit schema preserves rows") {
    val dir = tmpDir() + "/jsonl"
    val in = silver
    Sinks.writeJsonl(in, dir)
    val back = Sinks.readJsonl(spark, in.schema, dir)
    assert(shape(back) == shape(in))
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty)
  }

  test("corrupt JSON lines: PERMISSIVE captures, FAILFAST raises") {
    import org.apache.spark.sql.types._
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/rows.jsonl"),
      ("""{"id": 1, "v": "ok"}""" + "\n" +
       """{"id": oops-not-json""" + "\n" +
       """{"id": 3, "v": "fine"}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the ingest default): bad line lands in the corrupt
    // column with data columns null, good lines parse — the quality
    // gate can then count/quarantine instead of dying mid-scan
    val rows = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/rows.jsonl")
      .collect()
    assert(rows.length == 3)
    val corrupt = rows.filter(!_.isNullAt(2))
    assert(corrupt.length == 1 && corrupt.head.isNullAt(0))
    assert(rows.filter(_.isNullAt(2)).map(_.getLong(0)).toSet == Set(1L, 3L))
    // FAILFAST: the same file must abort the scan
    val failed = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.fields.take(2)))
        .option("mode", "FAILFAST").json(s"$dir/rows.jsonl").collect()
    }
    assert(failed.getMessage.contains("FAILFAST") ||
      failed.getCause != null)
  }

  // --- S4/S5/S6 JDBC parity (SURVEY §2.1) against embedded Derby ---
  // (the JDBC driver that ships with Spark; same spark.read/write.jdbc
  // path a real PostgreSQL deployment uses, minus the network)

  private def derbyUrl = {
    // Derby writes derby.log to user.dir unless told otherwise
    System.setProperty("derby.stream.error.field",
      "java.lang.System.err")
    s"jdbc:derby:${tmpDir()}/db;create=true"
  }

  test("JDBC S5 overwrite + S4 scan round-trip (embedded Derby)") {
    import spark.implicits._
    val url = derbyUrl
    val in = Seq((1L, "alpha", 3.5), (2L, "beta", 4.5), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
    Sinks.jdbcOverwrite(in, url, "bronze_rt")
    val back = graft.sources.Tables.jdbc(spark, url, "bronze_rt")
    assert(back.count() == 3)
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty)
    // overwrite = full replace, like pandas to_sql(if_exists='replace')
    val in2 = Seq((9L, "delta", 1.0)).toDF("id", "name", "score")
    Sinks.jdbcOverwrite(in2, url, "bronze_rt")
    assert(graft.sources.Tables.jdbc(spark, url, "bronze_rt").count() == 1)
  }

  test("JDBC S6 append-dedup is idempotent and first-write-wins") {
    import spark.implicits._
    val url = derbyUrl
    val b1 = Seq((1L, "first"), (2L, "two")).toDF("k", "v")
    assert(Sinks.jdbcAppendDedup(b1, url, "silver_rt", "k") == 2)
    // re-run: zero appended (ON CONFLICT DO NOTHING semantics)
    assert(Sinks.jdbcAppendDedup(b1, url, "silver_rt", "k") == 0)
    // conflicting key keeps the FIRST version; new key lands
    val b2 = Seq((1L, "CHANGED"), (3L, "three")).toDF("k", "v")
    assert(Sinks.jdbcAppendDedup(b2, url, "silver_rt", "k") == 1)
    val rows = graft.sources.Tables.jdbc(spark, url, "silver_rt")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "first", 2L -> "two", 3L -> "three"))
  }

  test("JDBC S6 append-dedup handles schema-qualified and underscore table names") {
    import spark.implicits._
    val url = derbyUrl
    // schema-qualified name: the old getTables probe passed the whole
    // string as a TABLE_NAME pattern and always said "absent" — the
    // second append would then skip the anti-join and write dupes.
    // The probe now resolves names exactly like the Spark read/write.
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Sinks.jdbcAppendDedup(b1, url, "APP.qualified_rt", "k") == 2)
    assert(Sinks.jdbcAppendDedup(b1, url, "APP.qualified_rt", "k") == 0)
    assert(graft.sources.Tables.jdbc(spark, url, "APP.qualified_rt").count() == 2)
    // '_' in getTables is a single-char WILDCARD: the pattern
    // "silver_rt" matches a pre-existing "silverXrt", so the old
    // probe would say "exists" for the not-yet-created silver_rt and
    // anti-join against the WRONG table. The probe-query approach
    // resolves the literal name: silverXrt must not shadow silver_rt.
    Sinks.jdbcOverwrite(Seq((9L, "x")).toDF("k", "v"), url, "silverXrt")
    assert(Sinks.jdbcAppendDedup(b1, url, "silver_rt", "k") == 2)
    assert(graft.sources.Tables.jdbc(spark, url, "silver_rt").count() == 2)
    // and silverXrt was not touched by the silver_rt appends
    assert(graft.sources.Tables.jdbc(spark, url, "silverXrt").count() == 1)
  }

  test("JDBC S6 probe: quoted/spaced names work, hostile names are refused") {
    import spark.implicits._
    val url = derbyUrl
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // a quoted identifier with a space passes through to the engine
    // verbatim — Spark interpolates dbtable raw, so the probe must too
    val spaced = "\"my silver table\""
    assert(Sinks.jdbcAppendDedup(b1, url, spaced, "k") == 2)
    assert(Sinks.jdbcAppendDedup(b1, url, spaced, "k") == 0)
    assert(graft.sources.Tables.jdbc(spark, url, spaced).count() == 2)
    // an injection-shaped config value must fail loudly BEFORE any
    // statement runs, not execute as SQL
    val hostile = "bronze_rt WHERE 1=1; DROP TABLE bronze_rt"
    intercept[IllegalArgumentException] {
      Sinks.jdbcAppendDedup(b1, url, hostile, "k")
    }
  }

  test("JDBC S6 probe: ambiguous statement failures propagate, not 'absent'") {
    import spark.implicits._
    val url = derbyUrl
    val b1 = Seq((1L, "a")).toDF("k", "v")
    // an absent table still maps to "absent" (the append creates it) --
    // Derby raises 42X05, which IS in the known undefined-table set
    assert(Sinks.jdbcAppendDedup(b1, url, "fresh_probe_rt", "k") == 1)
    // a statement-level error that is NOT an undefined-table SQLState
    // must rethrow, never read as "absent" (the advisor's
    // permission-denial / lock-timeout class: reading it as absent
    // skips the anti-join and appends duplicate keys). Deterministic
    // trigger in embedded Derby: an unquoted reserved word passes the
    // plain-identifier shape check but fails remotely with a 42X01
    // syntax error -- ambiguous, so it surfaces.
    val e = intercept[java.sql.SQLException] {
      Sinks.jdbcAppendDedup(b1, url, "select", "k")
    }
    assert(e.getSQLState != null && e.getSQLState != "42X05",
      s"expected a non-absence SQLState, got ${e.getSQLState}")
  }

  test("JDBC scan pushes filters and prunes columns into the remote query") {
    import spark.implicits._
    val url = derbyUrl
    Sinks.jdbcOverwrite(
      (1L to 100L).map(i => (i, s"row_$i", i * 1.0)).toDF("id", "name", "score"),
      url, "pushdown_rt")
    val df = graft.sources.Tables.jdbc(spark, url, "pushdown_rt")
      .filter($"id" > 90L).select($"name")
    val plan = df.queryExecution.executedPlan.toString
    // JDBCRelation advertises PushedFilters + a pruned ReadSchema
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"id predicate must reach the JDBC scan:\n$plan")
    assert(df.collect().map(_.getString(0)).toSet ==
      (91L to 100L).map(i => s"row_$i").toSet)
  }
}
