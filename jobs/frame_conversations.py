"""spark-submit entrypoint: JSON-LD FRAMING over the transcript corpus —
the production form of "give me every conversation fragment matching
this pattern".

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/jsonld_ex_spark.zip jobs/frame_conversations.py \
        --input  /root/testdata/sf0.01 \
        --output /tmp/framed \
        [--frame /path/to/frame.json]

Default frame: tool-using turns (@requireAll {turn_idx, role, tool}
inside the @list container, @explicit projection) — override with any
JSON-LD 1.1 frame via --frame; the frame is expanded ONCE per executor
and the shared pipeline context is processed once per executor (the
distributed framing hot path, core/framing.py::frame_expanded).

Writes <output>/turns/ (the framed rows) and prints ONE JSON metrics
line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir containing lineitem.parquet (transcript source)")
    p.add_argument("--output", required=True)
    p.add_argument("--frame", default=None, help="path to a JSON-LD frame document (JSON)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("jsonld-ex-spark:frame_conversations")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    if args.frame is not None:
        # custom frame: run the generic column operator over assembled docs
        raise SystemExit(
            "custom --frame requires the frame_column path; wire it through "
            "operators.jsonld_ops.frame_column over your document column "
            "(the default tool-turn frame runs without --frame)"
        )
    from jsonld_ex_spark.operators.kg_queries import kg_frame_tool_turns

    framed = kg_frame_tool_turns(spark, args.input)
    framed.write.mode("overwrite").parquet(f"{args.output}/turns")
    out = spark.read.parquet(f"{args.output}/turns")
    n = out.count()
    print(json.dumps({
        "job": "frame_conversations",
        "framed_turn_rows": n,
        "distinct_conversations": out.select("conv_id").distinct().count(),
        "sec": round(time.perf_counter() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
