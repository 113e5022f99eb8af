package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Dynamic per-connector column-mapping registry ≙ the reference's
  * in-progress DynamoDB `MODEL_MAPPING_DYNAMO_TABLE` fetch
  * (`lambda_function.py:26,174-181`; `utils/helper_functions.py:76-88`):
  * connector id → target-schema mapping, loaded from JSON instead of a
  * DynamoDB scan (the AWS transport is deployment machinery; the shape is
  * the capability).
  *
  * Expected JSON shape:
  * {"<connectorId>": {"columns": [
  *    {"name": "...", "source": "...", "type": "...", "format": "..."?}, ...]}}
  */
object MappingRegistry {

  def parse(json: String): Map[String, TargetSchema] = {
    val root = JsonMethods.parse(json)
    root match {
      case JObject(connectors) =>
        connectors.map { case (id, spec) =>
          val cols = spec \ "columns" match {
            case JArray(items) => items.map(col)
            case other => throw new IllegalArgumentException(
              s"connector $id: 'columns' must be an array, got $other")
          }
          id -> TargetSchema(cols)
        }.toMap
      case other =>
        throw new IllegalArgumentException(s"mapping root must be an object, got $other")
    }
  }

  private def col(j: JValue): ColumnMapping = {
    def str(field: String): String = j \ field match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException(s"column entry missing '$field': $j")
    }
    val fmt = j \ "format" match {
      case JString(s) => Some(s)
      case _ => None
    }
    ColumnMapping(str("name"), str("source"), str("type"), fmt)
  }

  def fromFile(path: String): Map[String, TargetSchema] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
