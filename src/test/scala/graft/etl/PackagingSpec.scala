package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** The shell/packaging layer (reference `deploy.sh` + docker analogs).
  * The full orchestration — entrypoint → verify-setup → one run → bounded
  * cron loop — is driven for real by `deploy.sh --no-docker` and
  * `GRAFT_CRON_TICKS=1 docker/entrypoint.sh` (both exercised in this
  * sandbox); the spec keeps the cheap invariants under `sbt test`: every
  * script stays syntactically valid bash, and the warehouse init SQL is
  * generated from the dialect code rather than hand-maintained.
  */
class PackagingSpec extends AnyFunSuite {

  private val repoRoot = {
    // tests fork with cwd = project root, but don't depend on it
    val here = new java.io.File(".").getCanonicalFile
    Iterator.iterate(here)(_.getParentFile)
      .takeWhile(_ != null)
      .find(d => new java.io.File(d, "bin/graft.sh").isFile)
      .getOrElse(fail("repo root with bin/graft.sh not found"))
  }

  private def bashAvailable: Boolean =
    try scala.sys.process.Process(Seq("bash", "--version")).!(scala.sys.process.ProcessLogger(_ => ())) == 0
    catch { case _: Throwable => false }

  test("launcher, entrypoint, and deploy scripts are valid bash") {
    assume(bashAvailable, "bash not available")
    for (script <- Seq("bin/graft.sh", "docker/entrypoint.sh", "deploy.sh")) {
      val f = new java.io.File(repoRoot, script)
      assert(f.isFile, s"$script missing")
      assert(f.canExecute, s"$script not executable")
      val code = scala.sys.process.Process(Seq("bash", "-n", f.getPath)).!
      assert(code === 0, s"$script fails bash -n")
    }
  }

  test("every graft.sh dispatch target resolves to a main on the classpath") {
    // ISO-8859-1: decodes any byte sequence (the script holds UTF-8 arrows
    // in comments and the test JVM's default charset is not pinned); the
    // main= targets we grep are pure ASCII either way
    val src = scala.io.Source.fromFile(new java.io.File(repoRoot, "bin/graft.sh"))(scala.io.Codec.ISO8859)
    val targets =
      try "main=(graft\\.[A-Za-z0-9.]+)".r.findAllMatchIn(src.mkString).map(_.group(1)).toSeq
      finally src.close()
    assert(targets.size >= 10, s"dispatch table looks truncated: $targets")
    targets.foreach { cls =>
      val m =
        try Class.forName(cls + "$").getField("MODULE$").get(null).getClass.getMethod("main", classOf[Array[String]])
        catch { case e: Throwable => fail(s"graft.sh target $cls unresolvable: $e") }
      assert(m != null, s"$cls has no main")
    }
  }

  test("warehouse init SQL is the dialect's own DDL, in execution order") {
    val sql = DialectDump.initSql(PostgresDialect)
    // exactly the create_* prefix of the statement inventory, each
    // semicolon-terminated so docker-entrypoint-initdb.d can execute it
    val ddl = DialectDump.statements(PostgresDialect).takeWhile(_._1.startsWith("create_"))
    assert(ddl.nonEmpty)
    var at = 0
    ddl.foreach { case (name, stmt, _) =>
      val i = sql.indexOf(stmt + ";")
      assert(i >= at, s"$name missing or out of order in init SQL")
      at = i
    }
    // and nothing but DDL: no INSERT/DELETE/MERGE leaks into the bootstrap
    assert(!sql.toUpperCase.contains("INSERT INTO"))
    assert(!sql.toUpperCase.contains("DELETE FROM"))
  }

  test("compose file parses as YAML and pins the topology contract") {
    // `docker compose config` can't run in this sandbox; a real YAML parse
    // (snakeyaml ships in /opt/spark/jars) plus required-keys assertions
    // catches drift the same way bash -n guards the scripts
    import scala.jdk.CollectionConverters._
    def m(o: Object): Map[String, Object] =
      o.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
    val f = new java.io.File(repoRoot, "docker/docker-compose.yml")
    assert(f.isFile, "docker/docker-compose.yml missing")
    val in = new java.io.FileInputStream(f)
    val root =
      try m(new org.yaml.snakeyaml.Yaml().load[Object](in))
      finally in.close()

    val services = m(root("services"))
    assert(services.contains("warehouse") && services.contains("graft"))

    val wh = m(services("warehouse"))
    assert(wh.contains("healthcheck"), "warehouse needs a healthcheck (graft gates on it)")
    val whVols = wh("volumes").asInstanceOf[java.util.List[Object]].asScala.map(_.toString)
    assert(
      whVols.exists(_.endsWith(":/docker-entrypoint-initdb.d")),
      "init SQL mount missing — the generated DDL would never run"
    )

    val g = m(services("graft"))
    val env = m(g("environment")).map { case (k, v) => k -> String.valueOf(v) }
    for (k <- Seq("DB_HOST", "DB_PORT", "POSTGRES_USER", "POSTGRES_PASSWORD", "POSTGRES_DB"))
      assert(env.contains(k), s"graft env $k missing — Main.sinkFor would fall back to parquet")
    // the credential trio must use the same ${VAR:-default} substitutions as
    // the warehouse service, so one override reconfigures both sides
    val whEnv = m(wh("environment")).map { case (k, v) => k -> String.valueOf(v) }
    for (k <- Seq("POSTGRES_USER", "POSTGRES_PASSWORD", "POSTGRES_DB"))
      assert(env(k) === whEnv(k), s"$k differs between graft and warehouse services")
    // restart must be the service-level key: plain `docker compose up`
    // ignores the swarm-only deploy.restart_policy block
    assert(g.contains("restart"), "graft needs a service-level restart policy")
    assert(!g.contains("deploy"), "deploy.restart_policy is swarm-only — use the restart key")
    val dep = m(m(g("depends_on"))("warehouse"))
    assert(String.valueOf(dep("condition")) === "service_healthy")
  }

  test("generated init file (when present) matches the current dialect DDL") {
    val f = new java.io.File(repoRoot, "docker/init/01-init-warehouse.sql")
    if (f.isFile) {
      val onDisk = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(onDisk === DialectDump.initSql(PostgresDialect), "regenerate with bin/graft.sh init-sql")
    }
  }
}
