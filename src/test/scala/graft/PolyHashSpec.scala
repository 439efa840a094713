package graft

import graft.plans.{GraftExtensions, PolyHash64}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("static hash matches the Java reference fold") {
    // acc = acc*31 + codePoint, wrapping 64-bit
    assert(PolyHash64.hash(UTF8String.fromString("hello world")) === 88006926820958916L)
    assert(PolyHash64.hash(UTF8String.fromString("")) === 0L)
  }

  test("non-BMP and CJK code points hash by code point, not UTF-16 unit") {
    val cjk = PolyHash64.hash(UTF8String.fromString("中"))
    assert(cjk === 20013L)
    val emoji = PolyHash64.hash(UTF8String.fromString(new String(Character.toChars(0x1F600))))
    assert(emoji === 0x1F600L) // single code point → acc = cp
  }

  test("SQL function registration evaluates through codegen") {
    GraftExtensions.register(spark)
    val out = Seq("hello world", "", "abc").toDF("s")
      .selectExpr("poly_hash64(s) AS h").as[Long].collect()
    assert(out(0) === 88006926820958916L)
    assert(out(1) === 0L)
    assert(out(2) === (('a' * 31L + 'b') * 31L + 'c'))
    // null propagates
    val n = Seq[Option[String]](None).toDF("s").selectExpr("poly_hash64(s)").collect()(0)
    assert(n.isNullAt(0))
  }

}
