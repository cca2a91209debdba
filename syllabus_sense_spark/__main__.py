"""CLI entry — the engine's equivalent of the reference's driver
script (/root/reference/main.py:14-22: parse one DOCX, run the
workflow, save next to it).

    python -m syllabus_sense_spark DOCX_PATH_OR_DIR OUTPUT_DIR \
        [--marker "Core element"] [--topics N] [--format parquet|json]

Differences are exactly the Spark recasting: the input may be a
directory of documents (the scan distributes file-per-task), the limit
is a plan-level ``LIMIT``, and the sink is a partitioned append
instead of a whole-file rewrite.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="syllabus_sense_spark")
    ap.add_argument("input", help="a .docx file or a directory of them")
    ap.add_argument("output", help="output directory (partitioned by topic)")
    ap.add_argument("--marker", default="Core element", help="topic marker text")
    ap.add_argument("--topics", type=int, default=None, help="limit topics (A19)")
    ap.add_argument("--format", choices=("parquet", "json"), default="parquet")
    ap.add_argument("--subject", default="chemistry", help="subject context (A8)")
    ap.add_argument(
        "--batch-size", type=int, default=5, help="generation micro-batch size (A10)"
    )
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from .operators.sessionize import group_topics, sessionize_elements
    from .pipeline.flagship import flagship_from_elements
    from .session import get_spark
    from .sinks import write_questions_json, write_questions_parquet
    from .sources.docx import docx_topics

    spark = get_spark("syllabus-sense-cli")
    elements = docx_topics(spark, args.input, marker=args.marker)
    if args.topics is not None:
        # A19: driver limit on topics — plan-level, not a collect loop.
        sess = sessionize_elements(elements)
        keep = (
            group_topics(sess)
            .select("doc_id", "topic_id")
            .orderBy("doc_id", "topic_id")
            .limit(args.topics)
        )
        sess = sess.join(F.broadcast(keep), ["doc_id", "topic_id"], "left_semi")
        questions = flagship_from_elements(
            sess.drop("topic_id"), doc_col="doc_id",
            subject=args.subject, batch_size=args.batch_size,
        )
    else:
        questions = flagship_from_elements(
            elements, doc_col="doc_id",
            subject=args.subject, batch_size=args.batch_size,
        )

    writer = (
        write_questions_parquet if args.format == "parquet" else write_questions_json
    )
    writer(questions, args.output)
    n = spark.read.parquet(args.output).count() if args.format == "parquet" else None
    print(f"wrote questions to {args.output}" + (f" ({n} rows)" if n is not None else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
