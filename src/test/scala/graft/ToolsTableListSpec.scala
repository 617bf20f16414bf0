package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Parity contract between the engine's table catalog and the local
  * gate tooling (r7 verdict #7 — scaffolding-debt retirement).
  *
  * The three checker tools (check_oracle / check_arrow_types /
  * check_driver_hash) create one DuckDB view per fixture table. Until
  * r8 each tool hard-coded its own copy of the 10-name list, so a
  * fixture change (a new table in TESTDATA.md, a rename) could desync
  * the local gate from the engine silently: the tool would keep
  * passing on the stale view set while Verify queried a table the
  * oracle never saw. Now the list lives ONCE in tools/tables.txt; the
  * tools read it at runtime, and this spec pins (a) the file against
  * [[Tables.all]] — order included, it documents dependency order —
  * and (b) the tools against the file, so a hard-coded list cannot
  * quietly return. (The ENGINE-facing per-column schema contract is
  * [[TablesContractSpec]]; this spec covers only the tooling seam.)
  */
class ToolsTableListSpec extends AnyFunSuite {

  private def repoFile(rel: String): String = {
    val p = Paths.get(rel)
    assert(Files.exists(p), s"$rel missing (spec must run from repo root)")
    new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
  }

  test("tools/tables.txt matches Tables.all exactly") {
    val fromFile = repoFile("tools/tables.txt").split("\\s+").toSeq.filter(_.nonEmpty)
    assert(fromFile == Tables.all,
      s"tools/tables.txt (${fromFile.mkString(",")}) != Tables.all " +
        s"(${Tables.all.mkString(",")}) — update BOTH or the oracle gate desyncs")
  }

  test("every checker tool reads tools/tables.txt and hard-codes no table list") {
    val tools = Seq("tools/check_oracle.py", "tools/check_arrow_types.py",
      "tools/check_driver_hash.py")
    tools.foreach { t =>
      val src = repoFile(t)
      assert(src.contains("tables.txt"),
        s"$t no longer reads tools/tables.txt")
      assert(!src.contains("\"region\""),
        s"$t hard-codes a table list again — it must read tools/tables.txt")
    }
  }

  test("every catalog table exists in the test fixture dir") {
    val missing = Tables.all.filterNot(t =>
      Files.exists(Paths.get(s"${TestSpark.sf}/$t.parquet")))
    assert(missing.isEmpty, s"fixture tables missing at ${TestSpark.sf}: $missing")
  }
}
