package graft.functions

import org.apache.spark.sql.SparkSession

/** Config-driven term-mapping vocabulary (SURVEY.md §1.3 / §2.9 F18):
  * the reference hot-reloads `config/term_mappings.yaml` per run
  * (src/common/term_mapper.py:215-296); here the vocabulary is a JSON
  * config re-read per batch — same lifecycle, engine-native parsing.
  *
  * Config shape (one JSON object per line or array):
  *   {"category":"positions","code":"GK","synonyms":["goalkeeper","torwart"]}
  *
  * The loaded map feeds [[Normalize.termLookup]], which compiles it into a
  * codegen CASE ladder — broadcast-free and rebuilt on every reload.
  */
object TermConfig {

  /** category → (normalized synonym → canonical code). */
  def load(spark: SparkSession, path: String): Map[String, Map[String, String]] = {
    import spark.implicits._
    val rows = spark.read.json(path)
      .select("category", "code", "synonyms")
      .as[(String, String, Seq[String])]
      .collect()
    rows.groupBy(_._1).map { case (cat, entries) =>
      cat -> entries.flatMap { case (_, code, syns) =>
        // A config line may omit `synonyms` entirely (spark.read.json
        // decodes it as null when other lines carry the column) or hold
        // null elements — the code itself is then the sole synonym,
        // never an NPE that aborts the vocabulary reload.
        val safe = Option(syns).getOrElse(Seq.empty).filter(_ != null)
        (safe :+ code).map(s => normalizeKey(s) -> code)
      }.toMap
    }
  }

  /** Driver-side mirror of Normalize.normalizeForMatching for config keys
    * (the config is tiny — normalizing it on the driver is the reference's
    * own shape; data-side normalization stays in the engine). */
  private def normalizeKey(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
      .toLowerCase
      .replaceAll("[^\\p{L}\\p{N}]+", " ")
      .trim
      .replaceAll("\\s+", " ")

  val StaticFallback: Map[String, Map[String, String]] = Map(
    "positions" -> Map(
      "goalkeeper" -> "GK", "torwart" -> "GK", "portero" -> "GK", "tw" -> "GK",
      "defender" -> "DF", "abwehr" -> "DF", "cb" -> "DF", "lb" -> "DF", "rb" -> "DF",
      "midfielder" -> "MF", "mittelfeld" -> "MF", "cm" -> "MF", "dm" -> "MF",
      "forward" -> "FW", "sturm" -> "FW", "striker" -> "FW", "st" -> "FW"),
    "footedness" -> Map(
      "right" -> "R", "rechts" -> "R", "left" -> "L", "links" -> "L",
      "both" -> "B", "beidfussig" -> "B"))
}
