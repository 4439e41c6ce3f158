#!/usr/bin/env bash
# Graft operational launcher: one entry point for every runnable main,
# without spark-submit — the Spark jars are an unmanaged classpath
# (default /opt/spark/jars, override SPARK_JARS_DIR), so a plain `java -cp`
# plus the JDK-17 --add-opens set (mirrors build.sbt / Spark's own
# JavaModuleOptions) is a complete launch. Builds the library jar on first
# use when sbt is available; in a container the pre-built jar sits on the
# default search path (newest jar in target/scala-2.13 wins; override
# with GRAFT_JAR).
#
# Usage: bin/graft.sh <command> [args...]
#   build         compile + package the library jar (needs sbt)
#   verify-setup  environment/installation checks   (graft.etl.VerifySetup)
#   run           one batch pipeline run            (graft.etl.Main)
#   cron          scheduled pipeline loop           (graft.etl.CronMain)
#   verify        correctness dump for the oracle   (graft.Verify)
#   bench         benchmark JSON line               (graft.Bench)
#   plan-audit    physical-plan hygiene report      (graft.PlanAudit)
#   dialect-sql   dump warehouse dialect SQL        (graft.etl.DialectDump)
#   init-sql      write warehouse bootstrap DDL     (DialectDump --init-sql)
#   ann-tune      ANN recall/scan-fraction sweep    (graft.tools.AnnTune)
#   ann-build     persist/refresh/compact ANN indexes (graft.tools.AnnBuild)
#   bm25-build    persist/refresh/compact the BM25 postings index (graft.tools.Bm25Build)
#   train-export  write training shard files + manifest (graft.tools.TrainExportMain)
#   corpus-report corpus health report (one text page) (graft.tools.CorpusReport)
#   scd2-maintain   one SCD2-history maintenance tick  (graft.tools.Scd2MaintainMain)
#   corpus-maintain one corpus-build maintenance tick  (graft.tools.CorpusMaintainMain)
#   cluster-maintain one dup-cluster maintenance tick (graft.tools.ClusterMaintainMain)
#   span-maintain   one span-dedup maintenance tick   (graft.tools.SpanMaintainMain)
#   ingest-tick     ALL maintainers, one drop, one command (graft.tools.IngestTickMain)
#   decontam-serve  decontamination dashboard from maintained state (graft.tools.DecontamServeMain)
set -euo pipefail

cd "$(dirname "$0")/.."

SPARK_JARS_DIR="${SPARK_JARS_DIR:-/opt/spark/jars}"
# newest-first so a leftover jar from an older version can't shadow the
# current build
GRAFT_JAR="${GRAFT_JAR:-$(ls -t target/scala-2.13/data_engineering_projectspark_*.jar 2>/dev/null | head -1 || true)}"

# JDK 17+ module opens Spark needs when launched outside spark-submit —
# keep in sync with build.sbt's jdk17AddOpens.
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio
  java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs
  java.base/sun.security.action java.base/sun.util.calendar
)
JVM_FLAGS=()
for p in "${ADD_OPENS[@]}"; do JVM_FLAGS+=("--add-opens=$p=ALL-UNNAMED"); done
JVM_FLAGS+=(
  "-Dspark.ui.enabled=false"
  "-Dspark.sql.session.timeZone=UTC"
  "-Xmx${SPARK_DRIVER_MEM:-8g}"
)

cmd="${1:-help}"
shift || true

main=""
case "$cmd" in
  build)        exec sbt -batch package ;;
  verify-setup) main=graft.etl.VerifySetup ;;
  run)          main=graft.etl.Main ;;
  cron)         main=graft.etl.CronMain ;;
  verify)       main=graft.Verify ;;
  bench)        main=graft.Bench ;;
  plan-audit)   main=graft.PlanAudit ;;
  dialect-sql)  main=graft.etl.DialectDump ;;
  init-sql)     main=graft.etl.DialectDump; set -- --init-sql "$@" ;;
  ann-tune)     main=graft.tools.AnnTune ;;
  ann-build)    main=graft.tools.AnnBuild ;;
  bm25-build)   main=graft.tools.Bm25Build ;;
  train-export) main=graft.tools.TrainExportMain ;;
  corpus-report) main=graft.tools.CorpusReport ;;
  scd2-maintain)   main=graft.tools.Scd2MaintainMain ;;
  corpus-maintain) main=graft.tools.CorpusMaintainMain ;;
  cluster-maintain) main=graft.tools.ClusterMaintainMain ;;
  span-maintain)   main=graft.tools.SpanMaintainMain ;;
  ingest-tick)     main=graft.tools.IngestTickMain ;;
  decontam-serve)  main=graft.tools.DecontamServeMain ;;
  help|--help|-h)
    # print the header comment block (everything between the shebang and
    # the first non-comment line), stripping the leading '# '
    awk 'NR > 1 { if (!/^#/) exit; sub(/^# ?/, ""); print }' "$0"
    exit 0 ;;
  *)
    echo "unknown command: $cmd (try: bin/graft.sh help)" >&2
    exit 2 ;;
esac

if [ -z "$GRAFT_JAR" ] || [ ! -f "$GRAFT_JAR" ]; then
  if command -v sbt >/dev/null 2>&1; then
    echo "[graft] library jar missing — building with sbt package..." >&2
    sbt -batch package >&2
    GRAFT_JAR="$(ls -t target/scala-2.13/data_engineering_projectspark_*.jar | head -1)"
  else
    echo "[graft] ERROR: no library jar at target/scala-2.13/ and no sbt to build one (set GRAFT_JAR)" >&2
    exit 1
  fi
fi

if [ ! -d "$SPARK_JARS_DIR" ]; then
  echo "[graft] ERROR: Spark jars directory not found: $SPARK_JARS_DIR (set SPARK_JARS_DIR)" >&2
  exit 1
fi

exec java "${JVM_FLAGS[@]}" -cp "$GRAFT_JAR:$SPARK_JARS_DIR/*" "$main" "$@"
