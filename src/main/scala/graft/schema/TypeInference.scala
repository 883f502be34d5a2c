package graft.schema

import org.apache.spark.sql.types._
import scala.util.matching.Regex

/** Driver-side schema subsystem (reference C9/C10/C11, S2, S10).
  *
  * These are pure Scala functions over schema *metadata* — never row
  * expressions — mirroring how the reference resolves types before any data
  * moves (sync_ALL.py:59-126, sync_INCREMENTAL.py:100-148).
  */
object TypeInference {

  /** Name-convention type inference (reference `infer_column_type`,
    * sync_INCREMENTAL.py:100-148): classify a column by prefix/suffix
    * convention, with an exception list, falling back to string.
    */
  def inferByName(
      name: String,
      datePrefixes: Seq[String] = Seq("FEC", "PER"),
      moneyPrefixes: Seq[String] = Seq("IMP", "ABO", "SAL", "MON"),
      intPrefixes: Seq[String] = Seq("NUM", "COB", "ZON", "BAJA", "COD"),
      exceptions: Map[String, DataType] = Map(
        "PERLIQUIDA" -> StringType, // period label "Febrero /2022", not a date
        "NUMSOCIO" -> StringType,   // numeric-looking but a string key
        "SOCLIQUIDA" -> StringType
      )): DataType = {
    val u = name.toUpperCase
    exceptions.getOrElse(u, {
      if (datePrefixes.exists(u.startsWith)) TimestampType
      else if (moneyPrefixes.exists(u.startsWith)) DecimalType(15, 4)
      else if (intPrefixes.exists(u.startsWith)) IntegerType
      else StringType
    })
  }

  /** DDL type string -> Spark type (reference `convert_access_type_to_mysql`,
    * sync_ALL.py:99-126). Accepts the textual types the reference's regex
    * parser emits.
    */
  def fromDdlType(t: String): DataType = {
    val u = t.trim.toUpperCase
    val VarcharN: Regex = """VARCHAR\s*\(\s*(\d+)\s*\)""".r
    val DecimalPS: Regex = """DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
    u match {
      case VarcharN(_)                                    => StringType
      case DecimalPS(p, s)                                => DecimalType(p.toInt, s.toInt)
      case s if s.startsWith("TINYINT(1)") || s == "BOOLEAN" || s == "BOOL" || s == "YESNO" => BooleanType
      case s if s.contains("CURRENCY")                    => DecimalType(15, 4) // Access money
      case s if s.contains("BIGINT")                      => LongType
      case s if s.contains("AUTONUMBER") || s.contains("COUNTER") => IntegerType
      case s if s.contains("INT")                         => IntegerType
      case s if s.contains("DOUBLE") || s.contains("FLOAT") || s.contains("REAL") || s.contains("SINGLE") => DoubleType
      case s if s.contains("DATE") || s.contains("TIME")  => TimestampType
      case s if s.contains("TEXT") || s.contains("CHAR") || s.contains("MEMO") => StringType
      case _                                              => StringType // reference default VARCHAR(255)
    }
  }

  /** Parse a `CREATE TABLE`-style DDL block into a schema (reference C11,
    * sync_ALL.py:72-96): one backtick-quoted column per line.
    */
  // The type group matches only KNOWN type tokens (incl. the two-word Access
  // forms "Long Integer" / "Double Precision") so a lazy multi-word column
  // name never loses its tail words to the type group.
  private val TypeTokens =
    "(?:Long\\s+Integer|Double\\s+Precision|AutoNumber|Auto_Increment|DateTime|Date|Time(?:stamp)?|" +
      "Text|Memo|Byte|Integer|Single|Double|Currency|Boolean|Bool|YesNo|" +
      "VarChar|Char|Decimal|Numeric|BigInt|SmallInt|TinyInt|Int|Float|Real)"
  private val ColLine: Regex =
    ("""(?mi)^\s*[`"\[]?([A-Za-z_][\w ]*?)[`"\]]?\s+(""" + TypeTokens +
      """(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*,?\s*$""").r

  def parseDdl(ddl: String): StructType = {
    val body = ddl.indexOf('(') match {
      case -1 => ddl
      case i  => ddl.substring(i + 1, math.max(i + 1, ddl.lastIndexOf(')')))
    }
    val fields = ColLine.findAllMatchIn(body).collect {
      case m if !Set("PRIMARY", "FOREIGN", "UNIQUE", "KEY", "CONSTRAINT", "INDEX")
        .contains(m.group(1).toUpperCase.takeWhile(_ != ' ')) =>
        StructField(m.group(1).trim, fromDdlType(m.group(2)), nullable = true)
    }.toSeq
    StructType(fields)
  }

  /** Order-preserving column union across heterogeneous row sets
    * (reference `get_all_columns`, sync_ALL.py:158-165): first-seen order,
    * later schemas contribute only their novel columns.
    */
  def unionColumns(schemas: Seq[Seq[String]]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    schemas.foreach(_.foreach(seen.add))
    seen.toSeq
  }

  /** Schema evolution (reference S10 `ADD COLUMN IF NOT EXISTS`,
    * server.py:116-119): widen `base` with any fields in `incoming` it
    * lacks, as nullable.
    */
  def evolve(base: StructType, incoming: StructType): StructType = {
    val have = base.fieldNames.map(_.toLowerCase).toSet
    StructType(base.fields ++ incoming.fields.filterNot(f => have(f.name.toLowerCase))
      .map(_.copy(nullable = true)))
  }
}
