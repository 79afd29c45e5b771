package graft.catalog

import graft.catalog.CommitLogTableStore.FileMeta
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property coverage for the r14 commit-log line format: the sized
  * `ADD <rel> <size>[ s<min>:<max>]` operand must round-trip through
  * `parseEntry` for EVERY rel path the stores can produce — including
  * partition values containing spaces, digits, `s1:2`-shaped tokens and
  * Spark's `%`-escapes (none of which are space-escaped on disk) — and a
  * bare legacy operand must parse to (rel, no meta) unchanged. The one
  * structural invariant the right-to-left parse leans on is that a rel
  * path always ENDS in a Spark-generated data-file name, which is never
  * an all-digit or `s<digits>:<digits>` token. */
object CommitLogLineProps extends Properties("commitlog-lines") {

  private val store = CommitLogTableStore("/tmp/clprops-unused")

  /** op dirs are 12 lowercase-hex chars — including the all-digit corner. */
  private val genOpId: Gen[String] =
    Gen.oneOf(
      Gen.listOfN(12, Gen.oneOf(('0' to '9') ++ ('a' to 'f'))).map(_.mkString),
      Gen.const("123456789012")) // all digits: must never confuse the parse

  /** A partition-dir segment, adversarial: spaces, digits, colon-tokens,
    * Hive escapes — everything escapePathName leaves or produces. */
  private val genPartDir: Gen[String] = for {
    col <- Gen.oneOf("job_id", "instance_id", "type")
    v <- Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.const("a b c"), Gen.const("42 7"), Gen.const("s1:2"),
      Gen.const("x%3Ay"), Gen.const("9999999999"),
      Gen.const("__HIVE_DEFAULT_PARTITION__"))
  } yield s"$col=$v"

  /** Spark part-file names: always carry letters (never all-digit). */
  private val genFile: Gen[String] = for {
    n <- Gen.choose(0, 99999)
    uuid <- Gen.listOfN(8, Gen.oneOf(('0' to '9') ++ ('a' to 'f'))).map(_.mkString)
  } yield f"part-$n%05d-$uuid.c000.snappy.parquet"

  private val genRel: Gen[String] = for {
    op <- genOpId
    part <- Gen.option(genPartDir)
    file <- genFile
  } yield (Seq(op) ++ part.toSeq :+ file).mkString("/")

  /** Envelope doubles, adversarial: negatives, -0.0, scientific
    * notation, extremes — everything Double.toString can emit (which is
    * exactly what entryLine writes; toString round-trips). */
  private val genDbl: Gen[Double] = Gen.oneOf(
    Gen.choose(-180.0, 180.0), Gen.const(-0.0), Gen.const(1.23e-12),
    Gen.const(-9.87e15), Gen.const(Double.MaxValue))

  private val genMeta: Gen[FileMeta] = for {
    size <- Gen.choose(0L, 999999999999999999L) // < 19 digits: real sizes
    stats <- Gen.option(for {
      mn <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      span <- Gen.choose(0L, 1000000L)
    } yield (mn, mn + span))
    bbox <- Gen.option(for {
      x0 <- genDbl; y0 <- genDbl; x1 <- genDbl; y1 <- genDbl
    } yield (x0, y0, x1, y1))
  } yield FileMeta(size, stats, bbox)

  property("sized lines round-trip") = forAll(genRel, genMeta) { (rel, m) =>
    val line = store.entryLine("ADD", rel, m)
    Prop(line.startsWith("ADD ") &&
      store.parseEntry(line.drop(4)) == ((rel, Some(m))))
  }

  property("legacy bare operands parse unchanged") = forAll(genRel) { rel =>
    Prop(store.parseEntry(rel) == ((rel, None)))
  }

  property("a REMOVE built by echoing a sized ADD operand still matches") =
    forAll(genRel, genMeta) { (rel, m) =>
      // the in-doubt spec (and any external tooling) constructs REMOVEs
      // by copying ADD operands verbatim — the parse must strip the
      // metadata tokens so the rel matches its live entry
      val echoed = store.entryLine("ADD", rel, m).drop(4)
      Prop(store.parseEntry(echoed)._1 == rel)
    }
}
