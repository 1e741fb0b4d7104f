"""Snapshot / compare a registry query's full result rows.

For rows-only registry entries (no DuckDB oracle) the optimization
rounds still require BIT-IDENTICAL results across a plan
restructuring. Usage:

    python tools/snapshot_rows.py save <tag> <query> [<query> ...]
    python tools/snapshot_rows.py diff <tag> <query> [<query> ...]

Snapshots land in /tmp/rowsnap_<tag>_<query>_<sf>.pkl for every
fixture tier present (sf0.01, sf0.1); diff re-runs the query and
compares canonically sorted frames cell-for-cell (exact, including
float bit patterns).
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def canon(df):
    import pandas as pd

    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            pdf[c] = pdf[c].map(
                lambda v: None if v is None else tuple(np.asarray(v).tolist())
            )
    order = np.lexsort(
        [pdf[c].astype(str).to_numpy() for c in reversed(pdf.columns)]
    )
    return pdf.iloc[order].reset_index(drop=True)


def main() -> None:
    mode, tag, *names = sys.argv[1:]
    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY
    from aws_dms_cdc_data_pipeline_spark.session import get_spark

    spark = get_spark("rowsnap")
    failed = False
    for name in names:
        for sf_dir in SFS:
            if not os.path.isdir(sf_dir):
                continue
            sf = os.path.basename(sf_dir)
            path = f"/tmp/rowsnap_{tag}_{name}_{sf}.pkl"
            spark.catalog.clearCache()
            pdf = canon(REGISTRY[name].fn(spark, sf_dir))
            if mode == "save":
                with open(path, "wb") as f:
                    pickle.dump(pdf, f)
                print(f"saved {name}@{sf}: {len(pdf)} rows")
            else:
                with open(path, "rb") as f:
                    ref = pickle.load(f)
                same = ref.equals(pdf)
                print(f"{'OK  ' if same else 'DIFF'} {name}@{sf}: "
                      f"{len(ref)} vs {len(pdf)} rows")
                if not same:
                    failed = True
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
