package graft.plans

import com.fasterxml.jackson.core.JsonParser.Feature
import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared Jackson plumbing for the raw-JSON passthrough kernels.
  * BigDecimal floats so re-serialization never perturbs a numeric
  * literal from the source document. */
private[plans] object JsonKernel {
  lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    m.configure(Feature.ALLOW_COMMENTS, false)
    m
  }
}

/** Split a text blob holding one-or-more top-level JSON documents into
  * the raw JSON string of each record: a top-level array yields its
  * elements, a top-level object yields itself, and concatenated /
  * line-delimited roots each yield one record — so one reader covers
  * the reference's one-advisory-per-file layout
  * (`providers/rocky/parser.py:52-55`), a bulk array download, and the
  * JSONL layout a 100 TB corpus would actually use. Fully-malformed
  * input → null (caller routes/filters, never a job failure); a
  * malformed record MID-blob salvages the records parsed before it
  * and drops the rest — Jackson cannot re-sync a stream after a bad
  * token, so the choice is partial salvage or voiding the whole blob,
  * and a one-record-per-file layout (the reference's) makes the two
  * identical anyway.
  *
  * Row-local and bounded by the input blob; no shuffle implications.
  */
case class JsonRecordsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    try {
      val parser = JsonKernel.mapper.createParser(
        v.asInstanceOf[UTF8String].toString)
      val it = JsonKernel.mapper.readValues(parser, classOf[JsonNode])
      while (it.hasNext) {
        val n = it.next()
        if (n.isArray) {
          val e = n.elements()
          while (e.hasNext) out += UTF8String.fromString(e.next().toString)
        } else out += UTF8String.fromString(n.toString)
      }
      new GenericArrayData(out.toArray)
    } catch {
      case _: java.io.IOException | _: RuntimeException =>
        // salvage the records parsed before the malformed tail: a
        // truncated final record in a concatenated blob must not void
        // the valid records ahead of it. A blob that yields NOTHING
        // stays null (fully-malformed input signal for the caller).
        if (out.isEmpty) null else new GenericArrayData(out.toArray)
    }
  }

  override protected def withNewChildInternal(c: Expression): JsonRecordsExpr =
    copy(child = c)
  override def prettyName: String = "json_records"
}

/** F19 patch kernel for the OSV passthrough family (`utils/osv.py:
  * 103-110`): given the raw record JSON and a map of
  * `apos*100000+rpos → [{version,date,kind}…]`, set
  * `affected[apos].ranges[rpos].database_specific.anchore.fixes`,
  * preserving every other key of an existing database_specific object
  * (the reference mutates the loaded dict in place — `db_spec["anchore"]
  * = {...}`). Everything else in the record — credits, record- and
  * affected-level database_specific/ecosystem_specific, unknown future
  * fields — survives verbatim because the record is never projected
  * through a typed schema on the emit path.
  *
  * Row-local: the expensive relational work (which fix gets which date)
  * happens OUTSIDE in joins/aggregations; this kernel only re-attaches
  * the verdict to the document it came from.
  */
case class OsvFixPatchExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == StringType && (right.dataType match {
      case MapType(LongType, ArrayType(StructType(fs), _), _) =>
        fs.toSeq.map(_.name) == Seq("version", "date", "kind") &&
          fs.forall(_.dataType == StringType)
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"osv_fix_patch expects (string, map<bigint,array<struct<version," +
        s"date,kind:string>>>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(rawAny: Any, mapAny: Any): Any = {
    val mapper = JsonKernel.mapper
    val root =
      try mapper.readTree(rawAny.asInstanceOf[UTF8String].toString)
      catch { case _: java.io.IOException => null }
    if (root == null || !root.isObject) return rawAny
    val fixes = mapAny.asInstanceOf[MapData]
    val keys = fixes.keyArray()
    val vals = fixes.valueArray()
    val byKey = new java.util.HashMap[Long, ArrayData](fixes.numElements())
    var i = 0
    while (i < fixes.numElements()) {
      byKey.put(keys.getLong(i),
        vals.getArray(i))
      i += 1
    }
    val affected = root.get("affected")
    if (affected == null || !affected.isArray) return rawAny
    var ai = 0
    val affIt = affected.elements()
    while (affIt.hasNext) {
      val aff = affIt.next()
      val ranges = aff.get("ranges")
      if (ranges != null && ranges.isArray) {
        var ri = 0
        val rngIt = ranges.elements()
        while (rngIt.hasNext) {
          val rng = rngIt.next()
          val entry = byKey.get(ai.toLong * 100000L + ri)
          if (entry != null && rng.isObject) {
            val rngObj = rng.asInstanceOf[ObjectNode]
            val dbSpec = rng.get("database_specific") match {
              case o: ObjectNode => o
              case _ => mapper.createObjectNode()
            }
            val fixArr = mapper.createArrayNode()
            var fi = 0
            while (fi < entry.numElements()) {
              val f = entry.getStruct(fi, 3)
              val o = mapper.createObjectNode()
              o.put("version", f.getUTF8String(0).toString)
              o.put("date", f.getUTF8String(1).toString)
              o.put("kind", f.getUTF8String(2).toString)
              fixArr.add(o)
              fi += 1
            }
            val anchore = mapper.createObjectNode()
            anchore.set[JsonNode]("fixes", fixArr)
            dbSpec.set[JsonNode]("anchore", anchore)
            rngObj.set[JsonNode]("database_specific", dbSpec)
          }
          ri += 1
        }
      }
      ai += 1
    }
    UTF8String.fromString(root.toString)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : OsvFixPatchExpr = copy(left = l, right = r)
  override def prettyName: String = "osv_fix_patch"
}

object JsonExpressions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def json_records(text: Column): Column =
    column(JsonRecordsExpr(expression(text)))
  def osv_fix_patch(raw: Column, fixmap: Column): Column =
    column(OsvFixPatchExpr(expression(raw), expression(fixmap)))
}
