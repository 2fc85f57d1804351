package graft

import java.nio.file.Files

import scala.sys.process._

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level type sweep over EVERY registered oracle: the driver's hash
  * compare is type-sensitive, and round 8 shipped four oracles whose
  * uncast integer sum() DuckDB types as HUGEINT (arrow decimal128(38,0))
  * where Spark emits int64 — values matched, hashes didn't. This spec
  * closes that class for good, without executing a single query:
  *
  *  - Spark side: `SparkEntry.queries(name)` analyzed schema (lazy — the
  *    plan resolves, nothing runs).
  *  - Oracle side: `tools/check.py --describe`, which runs DuckDB
  *    `DESCRIBE (sql)` — also plan-only.
  *
  * Both are canonicalized to the same type vocabulary and must agree on
  * every shared column. A HUGEINT/decimal mismatch (the round-8 defect)
  * fails here at fixture scale before the driver ever sees it.
  */
class OracleTypeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def canonSpark(t: DataType): String = t match {
    case LongType              => "int64"
    case IntegerType           => "int32"
    case ShortType             => "int16"
    case ByteType              => "int8"
    case DoubleType            => "float64"
    case FloatType             => "float32"
    case StringType            => "string"
    case BooleanType           => "bool"
    case BinaryType            => "binary"
    case DateType              => "date"
    case _: TimestampType      => "timestamp"
    case d: DecimalType        => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _)       => s"list<${canonSpark(e)}>"
    case other                 => other.simpleString
  }

  private val DecimalRe = """DECIMAL\((\d+),(\d+)\)""".r
  private val ListRe = """(.+)\[\]""".r
  private def canonDuck(t: String): String = t.trim match {
    case "BIGINT"                    => "int64"
    case "INTEGER"                   => "int32"
    case "SMALLINT"                  => "int16"
    case "TINYINT"                   => "int8"
    case "HUGEINT"                   => "decimal(38,0)" // arrow face of int128
    case "DOUBLE"                    => "float64"
    case "FLOAT" | "REAL"            => "float32"
    case "VARCHAR"                   => "string"
    case "BOOLEAN"                   => "bool"
    case "BLOB"                      => "binary"
    case "DATE"                      => "date"
    case s if s.startsWith("TIMESTAMP") => "timestamp"
    case DecimalRe(p, s)             => s"decimal($p,$s)"
    case ListRe(inner)               => s"list<${canonDuck(inner)}>"
    case other                       => other
  }

  // Minimal JSON reader for the flat {name: {col: type}} shape --describe
  // emits (keys and values are escaped strings, no nesting beyond 2).
  private def parseDescribe(json: String): Map[String, Map[String, String]] = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(\{(?:[^{}"]|"(?:[^"\\]|\\.)*")*\})""".r
    val field = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(s: String): String =
      s.replace("\\\"", "\"").replace("\\\\", "\\")
    entry.findAllMatchIn(json).map { m =>
      unesc(m.group(1)) ->
        field.findAllMatchIn(m.group(2))
          .map(f => unesc(f.group(1)) -> unesc(f.group(2))).toMap
    }.toMap
  }

  test("every oracle's DuckDB output types match Spark's analyzed schema") {
    val py = Seq("python3", "-c", "import duckdb").! == 0
    assume(py, "python3+duckdb unavailable — driver-side sweep only")

    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(tmp, Verify.oracleJson())
    val out = Seq("python3", "tools/check.py", "--describe",
      sfDir, tmp.toString).!!
    val duck = parseDescribe(out)
    assert(duck.size == SparkEntry.oracleSql.size,
      s"describe returned ${duck.size} of ${SparkEntry.oracleSql.size} oracles")

    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      duck(name).get("__error__").foreach(e =>
        errs += s"$name: oracle SQL fails to plan in DuckDB: $e")
      if (!duck(name).contains("__error__")) {
        val sparkSchema = SparkEntry.queries(name)(spark, sfDir).schema
        val sp = sparkSchema.fields.map(f => f.name -> canonSpark(f.dataType)).toMap
        val du = duck(name).map { case (c, t) => c -> canonDuck(t) }
        if (sp.keySet != du.keySet)
          errs += s"$name: column sets differ spark=${sp.keySet.toSeq.sorted} duck=${du.keySet.toSeq.sorted}"
        else for (c <- sp.keySet.toSeq.sorted if sp(c) != du(c))
          errs += s"$name.$c: spark=${sp(c)} duck=${du(c)}" + (
            if (du(c).startsWith("decimal") && !sp(c).startsWith("decimal"))
              "  <-- uncast integer aggregate? add CAST(... AS BIGINT)"
            else "")
      }
    }
    assert(errs.isEmpty, s"${errs.size} type defects:\n  " + errs.mkString("\n  "))
  }
}
