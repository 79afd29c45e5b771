package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, lower}

/** Pattern-predicate translation — port of the reference's parseLike
  * semantics (interface/database/pg/pg.go:238-277): `*` → `%`, `?` → `_`,
  * literal `_` escaped, trailing `(?i)` → case-insensitive; a pattern list
  * splits three ways into equals / LIKE / ILIKE, OR-combined.
  */
object Patterns {

  /** (translated, wasPattern): escape `_`, then `*`→`%`, `?`→`_`. */
  def parseString(s: String): (String, Boolean) = {
    val escaped = s.replace("_", "\\_")
    val translated = escaped.replace("*", "%").replace("?", "_")
    (translated, translated != escaped)
  }

  sealed trait Op
  case object Eq extends Op
  case object Like extends Op
  case object ILike extends Op

  /** One pattern → (value, operator) — pg.go:250-259. */
  def parseLike(value: String): (String, Op) =
    if (value.endsWith("(?i)")) (parseString(value.dropRight(4))._1, ILike)
    else {
      val (v, isPattern) = parseString(value)
      if (isPattern) (v, Like) else (value, Eq)
    }

  /** Pattern list → three-way split — pg.go:264-277. */
  def parseLikes(values: Seq[String]): (Seq[String], Seq[String], Seq[String]) = {
    val parsed = values.map(parseLike)
    (parsed.collect { case (v, Eq) => v },
      parsed.collect { case (v, Like) => v },
      parsed.collect { case (v, ILike) => v })
  }

  /** Build the OR-combined Column predicate for a pattern list over
    * `column` — the Spark form of pg_containers.go:273-288 (isin keeps the
    * equals set a single in-filter; likes/ilikes chain with OR). */
  def predicate(column: Column, patterns: Seq[String]): Option[Column] = {
    if (patterns.isEmpty) return None
    val (equals, likes, ilikes) = parseLikes(patterns)
    val parts: Seq[Column] =
      (if (equals.nonEmpty) Seq(column.isin(equals: _*)) else Nil) ++
        likes.map(p => column.like(p)) ++
        ilikes.map(p => lower(column).like(p.toLowerCase))
    Some(parts.reduce(_ || _))
  }
}
