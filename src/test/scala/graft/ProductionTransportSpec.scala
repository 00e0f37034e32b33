package graft

import java.net.{InetSocketAddress, Socket}

import org.apache.spark.sql.functions._

import graft.streaming.{Transport, UpsertSink}

/** Production transport integration: real `format("kafka")` and real
  * Postgres ON CONFLICT, driven through the SAME [[Transport]] entry
  * points the sandbox exercises via FileKafka/Derby. Each external
  * test probes its endpoint and SKIPS (ScalaTest cancel — never a
  * failure) when the connector jar or the service is absent, so the
  * suite is green both here and on a box with live infrastructure.
  */
class ProductionTransportSpec extends SparkSpec {
  import spark.implicits._

  private def classPresent(fqcn: String): Boolean =
    try { Class.forName(fqcn); true } catch { case _: Throwable => false }

  private def reachable(hostPort: String): Boolean = {
    val parts = hostPort.split(":")
    val (host, port) = (parts(0), if (parts.length > 1) parts(1).toInt else 9092)
    val s = new Socket()
    try { s.connect(new InetSocketAddress(host, port), 500); true }
    catch { case _: Throwable => false }
    finally s.close()
  }

  test("transport selection is pure config: env routes, URL picks dialect") {
    assert(Transport.wireFromEnv(Map("GRAFT_KAFKA_BOOTSTRAP" -> "b:9092"))
      === Transport.KafkaWire("b:9092", "graft"))
    assert(Transport.wireFromEnv(
      Map("GRAFT_KAFKA_BOOTSTRAP" -> "b:9092", "GRAFT_KAFKA_TOPIC" -> "t"))
      === Transport.KafkaWire("b:9092", "t"))
    assert(Transport.wireFromEnv(Map("GRAFT_WIRE_DIR" -> "/x"))
      === Transport.FileWire("/x"))
    assert(Transport.Warehouse("jdbc:postgresql://h/db", "t", Seq("k")).dialect
      === UpsertSink.Dialect.OnConflict)
    assert(Transport.Warehouse("jdbc:derby:memory:x", "t", Seq("k")).dialect
      === UpsertSink.Dialect.UpdateInsert)
    assert(Transport.warehouseFromEnv(Seq("k"), Map.empty).isEmpty)
    assert(Transport.warehouseFromEnv(Seq("k"),
      Map("GRAFT_WAREHOUSE_URL" -> "jdbc:postgresql://h/db"))
      .exists(_.dialect === UpsertSink.Dialect.OnConflict))
  }

  test("file wire through the production entry points: write, stream-read, parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wire").toString
    val wire = Transport.FileWire(dir)
    Transport.writeWire(Seq("""{"a":1}""", """{"a":2}""").toDF("value"), wire)
    val q = Transport.readWire(spark, wire)
      .select(col("value").cast("string").as("v"))
      .writeStream.format("memory").queryName("prod_wire_t").start()
    try {
      q.processAllAvailable()
      assert(spark.table("prod_wire_t").count() === 2)
    } finally q.stop()
  }

  test("kafka wire end-to-end [SKIPS without connector jar + live broker]") {
    assume(classPresent("org.apache.spark.sql.kafka010.KafkaSourceProvider"),
      "spark-sql-kafka connector not on the classpath")
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.exists(reachable),
      "no reachable Kafka broker (set GRAFT_KAFKA_BOOTSTRAP)")
    val wire = Transport.KafkaWire(bootstrap.get,
      s"graft-it-${System.currentTimeMillis()}")
    Transport.writeWire(Seq("""{"a":1}""", """{"a":2}""").toDF("value"), wire)
    val q = Transport.readWire(spark, wire)
      .select(col("value").cast("string").as("v"))
      .writeStream.format("memory").queryName("prod_wire_k").start()
    try {
      q.processAllAvailable()
      assert(spark.table("prod_wire_k").count() === 2)
    } finally q.stop()
  }

  test("postgres ON CONFLICT upsert, replay-idempotent [SKIPS without live postgres]") {
    assume(classPresent("org.postgresql.Driver"),
      "postgres JDBC driver not on the classpath")
    val url = sys.env.get("GRAFT_PG_URL") // jdbc:postgresql://host:5432/db?user=…
    assume(url.isDefined, "no Postgres endpoint (set GRAFT_PG_URL)")
    val wh = Transport.Warehouse(url.get, s"graft_it_${System.nanoTime()}", Seq("k"))
    assert(wh.dialect === UpsertSink.Dialect.OnConflict)
    val conn = java.sql.DriverManager.getConnection(wh.url)
    try {
      conn.createStatement().execute(UpsertSink.createTableSql(
        wh.table, Seq("k" -> "VARCHAR(10)", "v" -> "DOUBLE PRECISION"), Seq("k")))
      val b = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
      Transport.upsert(b, wh)
      Transport.upsert(b, wh) // replay absorbed by ON CONFLICT
      Transport.upsert(Seq(("b", 9.0)).toDF("k", "v"), wh)
      val rs = conn.createStatement().executeQuery(
        s"""SELECT "k", "v" FROM "${wh.table}" ORDER BY "k"""")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getString(1) -> r.getDouble(2)).toList
      assert(got === List("a" -> 1.0, "b" -> 9.0))
    } finally {
      try conn.createStatement().execute(s"""DROP TABLE "${wh.table}"""")
      finally conn.close()
    }
  }
}
