package graft.config

import graft.SparkSpec

class MongoPredicateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "Black", 10.0, "2024-01-01T00:00:00Z"),
    (2L, "White", 20.0, "2024-02-01T00:00:00Z"),
    (3L, "Red", 30.0, "2024-03-01T00:00:00Z"),
    (4L, null.asInstanceOf[String], 40.0, "2024-04-01T00:00:00Z")
  ).toDF("id", "color", "qty", "ts_s")
    .withColumn("ts", org.apache.spark.sql.functions.to_timestamp($"ts_s"))

  private def ids(json: String): Seq[Long] =
    df.filter(MongoPredicate.compile(json)).select("id").as[Long].collect().toSeq.sorted

  test("equality and implicit conjunction") {
    assert(ids("""{"color": "Black"}""") == Seq(1L))
    assert(ids("""{"color": "Black", "qty": 10}""") == Seq(1L))
    assert(ids("""{"color": "Black", "qty": 11}""") == Seq())
  }

  test("comparisons") {
    assert(ids("""{"qty": {"$gt": 20}}""") == Seq(3L, 4L))
    assert(ids("""{"qty": {"$gte": 20, "$lt": 40}}""") == Seq(2L, 3L))
    assert(ids("""{"qty": {"$lte": 10}}""") == Seq(1L))
    assert(ids("""{"id": {"$ne": 1}}""") == Seq(2L, 3L, 4L))
  }

  test("$in / $nin") {
    assert(ids("""{"color": {"$in": ["Black", "White"]}}""") == Seq(1L, 2L))
    // Mongo $nin matches docs whose field is missing/null too.
    assert(ids("""{"color": {"$nin": ["Black", "White"]}}""") == Seq(3L, 4L))
  }

  test("$exists") {
    assert(ids("""{"color": {"$exists": true}}""") == Seq(1L, 2L, 3L))
    assert(ids("""{"color": {"$exists": false}}""") == Seq(4L))
  }

  test("$and / $or / $nor / $not") {
    assert(ids("""{"$or": [{"color": "Black"}, {"qty": {"$gt": 25}}]}""") == Seq(1L, 3L, 4L))
    assert(ids("""{"$and": [{"qty": {"$gt": 5}}, {"qty": {"$lt": 25}}]}""") == Seq(1L, 2L))
    assert(ids("""{"$nor": [{"color": "Black"}, {"qty": {"$gt": 25}}]}""") == Seq(2L))
    assert(ids("""{"qty": {"$not": {"$gt": 20}}}""") == Seq(1L, 2L))
  }

  test("$regex") {
    assert(ids("""{"color": {"$regex": "^B"}}""") == Seq(1L))
  }

  test("extended JSON $date compares against timestamps") {
    assert(ids("""{"ts": {"$gte": {"$date": "2024-02-15T00:00:00Z"}}}""") == Seq(3L, 4L))
    assert(ids("""{"ts": {"$lt": {"$date": 1709251200000}}}""") == Seq(1L, 2L))
  }

  test("extended JSON numeric wrappers") {
    assert(ids("""{"id": {"$numberLong": "2"}}""") == Seq(2L))
    assert(ids("""{"qty": {"$gte": {"$numberDouble": "30.0"}}}""") == Seq(3L, 4L))
  }

  test("unsupported operator raises") {
    intercept[IllegalArgumentException] {
      ids("""{"qty": {"$mod": [2, 0]}}""")
    }
  }
}
