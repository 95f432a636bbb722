"""Line-level dedup (boilerplate removal)."""

import pyarrow as pa
import pandas as pd
import ray.data

from feast_ray.functions.linedup import common_line_hashes, line_dedup


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        )
    )


def test_line_dedup_strips_shared_lines_preserves_order():
    ds = _docs([
        (1, "NAV\nunique one\nFOOTER"),
        (2, "NAV\nunique two\nmiddle\nFOOTER"),
        (3, "NAV\nunique three\nFOOTER"),
    ])
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup(ds, "doc_id", "text", min_docs=2).take_all()
    }
    assert out == {1: "unique one", 2: "unique two\nmiddle", 3: "unique three"}


def test_line_dedup_all_boilerplate_doc_becomes_empty():
    ds = _docs([(1, "NAV\nFOOTER"), (2, "NAV\nFOOTER"), (3, "NAV\nbody\nFOOTER")])
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup(ds, "doc_id", "text", min_docs=2).take_all()
    }
    assert out[1] == "" and out[2] == "" and out[3] == "body"


def test_line_dedup_within_doc_repeats_count_once():
    # "dup" repeats inside doc 1 but appears in only ONE doc -> kept
    ds = _docs([(1, "dup\ndup\nbody"), (2, "other")])
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup(ds, "doc_id", "text", min_docs=2).take_all()
    }
    assert out[1] == "dup\ndup\nbody"


def test_line_dedup_min_docs_threshold_and_out_col():
    ds = _docs([(1, "x\na"), (2, "x\nb"), (3, "x\nc"), (4, "y\nd"), (5, "y\ne")])
    # min_docs=3: only "x" (3 docs) is boilerplate, "y" (2 docs) survives
    hashes = common_line_hashes(ds, "doc_id", "text", min_docs=3)
    assert len(hashes) == 1
    out = {
        r["doc_id"]: r["clean"]
        for r in line_dedup(
            ds, "doc_id", "text", min_docs=3, out_col="clean"
        ).take_all()
    }
    assert out == {1: "a", 2: "b", 3: "c", 4: "y\nd", 5: "y\ne"}


def test_dedup_within_doc_keeps_first_occurrence_in_order():
    from feast_ray.functions.linedup import dedup_within_doc

    df = pd.DataFrame(
        {
            "id": [1, 2],
            "t": [
                "a\n\nb\n\na\n\nc",   # repeat of 'a' dropped
                "x\n\nx\n\nx",        # collapses to one
            ],
        }
    )
    out = (
        dedup_within_doc(ray.data.from_pandas(df), "t")
        .to_pandas()
        .sort_values("id")
    )
    assert out["text_clean"].tolist() == ["a\n\nb\n\nc", "x"]
