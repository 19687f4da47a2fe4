"""Relational demo operators: partial-aggregate groupby and windowed
aggregation over stream-shaped tables (SURVEY.md §2.5 / §2.10 mappings).

The groupby pattern is the scale-correct one from the Ray guide: partial
aggregation INSIDE map_batches (one row per key per batch) so the shuffle
moves key-cardinality rows, not data-cardinality rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from pdftext_ray.ops import round_half_away


def lineitem_pricing_summary(ds: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H-Q1-flavored pricing summary with partial pre-aggregation.

    Output columns (must match the oracle SQL aliases): l_returnflag,
    l_linestatus, sum_qty, sum_base_price, sum_disc_price, n_rows.
    """
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("n_rows", alias_name="n_rows"),
    )

    def shape(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["sum_qty"] = round_half_away(df["sum_qty"], 2)
        df["sum_base_price"] = round_half_away(df["sum_base_price"], 2)
        df["sum_disc_price"] = round_half_away(df["sum_disc_price"], 2)
        df["n_rows"] = df["n_rows"].astype("int64")
        return pa.Table.from_pandas(
            df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "n_rows"]],
            preserve_index=False,
        )

    return final.map_batches(shape, batch_format="pyarrow")


def events_hourly_window(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type (batch-implemented streaming
    window, SURVEY.md §2.10): window_start, event_type, n_events, sum_value.

    Window assignment is a vectorized floor-to-hour inside map_batches (no
    per-key actor state needed — tumbling windows over bounded input reduce
    to a grouped aggregate on (window, key) with batch-level partials).
    """
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["window_start"] = df["ts"].dt.floor("h")
        g = df.groupby(["window_start", "event_type"], as_index=False).agg(
            n_events=("event_id", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    final = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )

    def shape(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_events"] = df["n_events"].astype("int64")
        df["sum_value"] = round_half_away(df["sum_value"], 2)
        return pa.Table.from_pandas(
            df[["window_start", "event_type", "n_events", "sum_value"]], preserve_index=False
        )

    return final.map_batches(shape, batch_format="pyarrow")


def distinct_values(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    """Distinct values of one column via batch-level pre-dedup + groupby
    (shuffle carries unique values per block, not all rows)."""
    def local(batch: pa.Table) -> pa.Table:
        col = batch.column(column).unique()
        return pa.Table.from_arrays([col], names=[column])

    return ds.select_columns([column]).map_batches(local, batch_format="pyarrow").groupby(
        column
    ).aggregate(Count(alias_name="_c")).drop_columns(["_c"])


def filter_project_documents(ds: ray.data.Dataset, min_chars: int = 200) -> ray.data.Dataset:
    """Pushdown demo: vectorized filter + projection (doc_id, lang, n_chars)."""
    def fp(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.greater(batch.column("n_chars"), min_chars))
        return keep.select(["doc_id", "lang", "n_chars"])

    return ds.map_batches(fp, batch_format="pyarrow")
