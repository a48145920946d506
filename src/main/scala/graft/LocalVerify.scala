package graft

import scala.util.matching.Regex

import graft.engine.Graft
import graft.verify.Canon

/** Local correctness gate: run every declared query at sf0.01, canonicalize
  * per SURVEY.md §2.3, compare to the cross-engine-verified hashes in
  * verification/expected_hashes_sf0.01.json.
  *
  * Usage: runMain graft.LocalVerify [sfDir] [namePrefix,...]
  */
object LocalVerify {

  def expectedHashes(path: String = "/root/repo/verification/expected_hashes_sf0.01.json"): Map[String, (String, Int)] = {
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val re: Regex = """"(q\w+)":\s*\{\s*"hash":\s*"([0-9a-f]+)",\s*"rows":\s*(\d+)""".r
    re.findAllMatchIn(txt).map(m => m.group(1) -> (m.group(2), m.group(3).toInt)).toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val only: Option[Seq[String]] = if (args.length > 1) Some(args(1).split(",").toSeq) else None
    // Stored hashes are sf0.01-specific; at any other scale run execute-only.
    val expected = if (sfDir.contains("sf0.01")) expectedHashes() else Map.empty[String, (String, Int)]
    val spark = Graft.session("graft-local-verify")

    var pass, fail, skip = 0
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(ps => ps.exists(n.startsWith)))
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val (h, n) = Canon.hashOf(SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        expected.get(name) match {
          case Some((eh, en)) =>
            if (h == eh && n == en) { pass += 1; println(f"PASS  $name%-28s $h rows=$n ($dt%.2fs)") }
            else { fail += 1; println(f"FAIL  $name%-28s got $h rows=$n, want $eh rows=$en ($dt%.2fs)") }
          case None =>
            skip += 1; println(f"INFO  $name%-28s $h rows=$n (no stored hash) ($dt%.2fs)")
        }
      } catch {
        case e: Throwable =>
          fail += 1
          println(s"ERROR $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.toSeq.headOption.getOrElse("")}")
      }
    }
    // A stored hash with no executed query means the contract SHRANK
    // (entry deleted or renamed without regenerating the hash file) — that
    // must fail the gate, not silently pass with fewer queries.
    if (only.isEmpty) {
      val orphaned = expected.keySet -- names.toSet
      orphaned.toSeq.sorted.foreach { n =>
        fail += 1
        println(s"FAIL  $n: stored expected hash but no declared query (contract shrank?)")
      }
    }
    println(s"== $pass pass, $fail fail, $skip unchecked ==")
    spark.stop()
    if (fail > 0) sys.exit(1)
  }
}
