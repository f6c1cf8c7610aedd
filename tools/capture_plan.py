#!/usr/bin/env python
"""Capture .explain('formatted') for a registered query (or a raw
extensions.* function) to stdout — the plan artifact the optimization
round commits under plans/r11/."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    key = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from mongodb_cdc_spark.registry import QUERIES, load_all_operators
    from mongodb_cdc_spark.session import get_spark

    spark = get_spark("capture-plan")
    load_all_operators()
    if key.startswith("raw:"):
        from mongodb_cdc_spark.operators import extensions

        df = getattr(extensions, key[4:])(spark, sf)
    else:
        df = QUERIES[key](spark, sf)
    print(df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    ))
    spark.stop()


if __name__ == "__main__":
    main()
