package graft

import graft.schema.TypeInference
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side schema subsystem (C9/C10/C11, S2/S10) — pure functions, no
  * Spark session needed.
  */
class TypeInferenceSpec extends AnyFunSuite {

  test("inferByName: prefix conventions with exception list") {
    assert(TypeInference.inferByName("FECLIQUIDA") == TimestampType)
    assert(TypeInference.inferByName("IMPLIQUIDA") == DecimalType(15, 4))
    assert(TypeInference.inferByName("NUMCOB") == IntegerType)
    assert(TypeInference.inferByName("NOMSOCIO") == StringType)
    // exceptions beat prefixes (the reference's hard-won bug list)
    assert(TypeInference.inferByName("PERLIQUIDA") == StringType)
    assert(TypeInference.inferByName("NUMSOCIO") == StringType)
  }

  test("fromDdlType: the reference's Access->MySQL surface") {
    assert(TypeInference.fromDdlType("VARCHAR(100)") == StringType)
    assert(TypeInference.fromDdlType("Long Integer") == IntegerType)
    assert(TypeInference.fromDdlType("DOUBLE") == DoubleType)
    assert(TypeInference.fromDdlType("TINYINT(1)") == BooleanType)
    assert(TypeInference.fromDdlType("DateTime") == TimestampType)
    assert(TypeInference.fromDdlType("DECIMAL(15,4)") == DecimalType(15, 4))
    assert(TypeInference.fromDdlType("whatever") == StringType) // default
  }

  test("parseDdl extracts backticked columns, skips constraints") {
    val ddl =
      """CREATE TABLE `Socios` (
        |  `NUMSOCIO` Text (20),
        |  `BAJA` Long Integer,
        |  `FECALTA` DateTime,
        |  PRIMARY KEY (`NUMSOCIO`)
        |);""".stripMargin
    val st = TypeInference.parseDdl(ddl)
    assert(st.fieldNames.toSeq == Seq("NUMSOCIO", "BAJA", "FECALTA"))
    assert(st("BAJA").dataType == IntegerType)
    assert(st("FECALTA").dataType == TimestampType)
    assert(st.fields.forall(_.nullable))
  }

  test("parseDdl: unquoted multi-word names keep their tail words") {
    val st = TypeInference.parseDdl(
      """CREATE TABLE t (
        |  fecha alta TIMESTAMP,
        |  Monto Total Currency
        |)""".stripMargin)
    assert(st.fieldNames.toSeq == Seq("fecha alta", "Monto Total"))
    assert(st("fecha alta").dataType == TimestampType)
    assert(st("Monto Total").dataType == DecimalType(15, 4)) // Access Currency
  }

  test("unionColumns preserves first-seen order (get_all_columns)") {
    assert(TypeInference.unionColumns(Seq(Seq("a", "b"), Seq("b", "c"), Seq("d")))
      == Seq("a", "b", "c", "d"))
  }

  test("evolve widens with novel nullable fields only") {
    val base = StructType(Seq(StructField("a", IntegerType, nullable = false)))
    val inc = StructType(Seq(
      StructField("A", StringType), StructField("b", DoubleType, nullable = false)))
    val out = TypeInference.evolve(base, inc)
    assert(out.fieldNames.toSeq == Seq("a", "b")) // A is a case-dup of a
    assert(out("b").nullable)
  }
}
