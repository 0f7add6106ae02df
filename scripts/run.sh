#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars,
# mirroring build.sbt's JDK17 module options. Usage:
#   scripts/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run.sh graft.Bench
#
# graft.Bench under THIS launcher (plain java, no sbt "[info]" stdout
# decoration) is the canonical bench entry point; it also writes the full
# summary JSON to bench_summary.json (override: SPARK_GRAFT_BENCH_SUMMARY)
# so no stdout capture can lose the totals.
#
# Deployable warehouse jobs (graft.apps.*; --source kafka needs a broker,
# --source file drains a directory of JSON lines; add --state-store rocksdb
# to any app when keyed streaming state outgrows executor heaps):
#   scripts/run.sh graft.apps.BaseLogApp --source file --input /data/logs \
#     --out /warehouse/dwd_log --checkpoint /ckpt/base_log
#   scripts/run.sh graft.apps.DimApp --source kafka --brokers host:9092 \
#     --topics topic_db --config /conf/table_process.csv \
#     --out /warehouse/dim --checkpoint /ckpt/dim --trigger '5 seconds'
#   scripts/run.sh graft.apps.DwdOrderApp --source file --input /data/cdc \
#     --dict /conf/base_dic.csv --out /warehouse/dwd_order --checkpoint /ckpt/dwd
#   scripts/run.sh graft.apps.DwsTradeProvinceOrderWindowApp \
#     --input /warehouse/dwd_order --provinces /conf/provinces.csv \
#     --out /warehouse/dws_province --checkpoint /ckpt/dws
#   scripts/run.sh graft.apps.CorpusIngestApp --source file --input /data/docs \
#     --index /corpus/sig_index --out /corpus/admitted --checkpoint /ckpt/ingest
#   scripts/run.sh graft.apps.DwdFactApp --fact all --source file \
#     --input /data/cdc --dict /conf/base_dic.csv \
#     --out /warehouse/dwd --checkpoint /ckpt/facts
#   scripts/run.sh graft.apps.DwsTradeSkuOrderWindowApp --input /warehouse/dwd_order \
#     --sku /dim/sku.csv --spu /dim/spu.csv --trademark /dim/tm.csv \
#     --c3 /dim/c3.csv --c2 /dim/c2.csv --c1 /dim/c1.csv \
#     --out /warehouse/dws_sku --checkpoint /ckpt/dws_sku
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_JAVA_OPTS: extra -D flags (e.g. the graft.* A/B toggles) for
# plan dumps / probes of a non-default variant.
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $GRAFT_JAVA_OPTS \
  -cp "$CP" "$@"
