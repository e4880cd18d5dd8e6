package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Registry-wide schema freeze: column NAMES are load-bearing for the
  * driver's correctness gate (it sorts columns by name before hashing, so
  * a silent rename green-locally-red-on-the-driver is the failure mode),
  * and TYPES are load-bearing for the hash's value classes. This spec
  * pins every registered query's schema against a checked-in snapshot so
  * an accidental rename/retype fails here, in `sbt test`, with a diff —
  * not 50 queries into the driver's oracle board.
  *
  * Intentional changes regenerate the snapshot:
  *   SPARK_GRAFT_UPDATE_SCHEMAS=1 sbt "testOnly graft.SchemaSnapshotSpec"
  * then commit the updated resource.
  */
class SchemaSnapshotSpec extends SparkSpec {

  private val resource = "src/test/resources/query_schemas.tsv"

  private def currentSchemas(): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val schema = fn(spark, sfDir).schema
      name -> schema.map(f => s"${f.name}:${f.dataType.simpleString}")
        .mkString(",")
    }

  test("every registered query's schema matches the checked-in snapshot") {
    val cur = currentSchemas()
    if (sys.env.get("SPARK_GRAFT_UPDATE_SCHEMAS").contains("1")) {
      val tmp = Files.createTempFile("schemas", ".tsv")
      Files.writeString(tmp,
        cur.map { case (n, s) => s"$n\t$s" }.mkString("", "\n", "\n"))
      Files.move(tmp, Paths.get(resource), StandardCopyOption.REPLACE_EXISTING)
      info(s"snapshot regenerated at $resource (${cur.size} queries)")
    } else {
      val path = Paths.get(resource)
      assert(Files.exists(path),
        s"missing $resource — regenerate with SPARK_GRAFT_UPDATE_SCHEMAS=1")
      val want = Files.readString(path).linesIterator
        .filter(_.nonEmpty).map { l =>
          val Array(n, s) = l.split("\t", 2); n -> s
        }.toMap
      val curMap = cur.toMap
      val missing = want.keySet -- curMap.keySet
      val added = curMap.keySet -- want.keySet
      val changed = (want.keySet & curMap.keySet)
        .filter(k => want(k) != curMap(k)).toSeq.sorted
        .map(k => s"$k:\n  snapshot: ${want(k)}\n  current:  ${curMap(k)}")
      assert(missing.isEmpty && added.isEmpty && changed.isEmpty,
        s"""query schema drift vs $resource —
           |removed: ${missing.toSeq.sorted.mkString(", ")}
           |added (regenerate the snapshot): ${added.toSeq.sorted.mkString(", ")}
           |changed:
           |${changed.mkString("\n")}
           |intentional? SPARK_GRAFT_UPDATE_SCHEMAS=1 sbt "testOnly graft.SchemaSnapshotSpec" and commit""".stripMargin)
    }
  }
}
