"""On-demand feature views + entity-mapping (join twice under
different keys) — reference patterns on_demand_feature_view.py and
join_key_map (SURVEY §2.6)."""

from datetime import timedelta

import numpy as np
import pandas as pd
import pytest

from feast_ray.store import Store
from feast_ray.views import Entity, OnDemandView, TableSource, View

USER = Entity("user", "user_id")


@pytest.fixture()
def store(tmp_path, sf_small):
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(
                name="user_values",
                source=TableSource(name="events", table="events", timestamp_field="ts"),
                entities=[USER],
                ttl=timedelta(days=2),
                features=["value"],
            ),
            OnDemandView(
                name="value_scaled",
                sources=("user_values:value",),
                features=("value_x2", "value_log"),
                udf=lambda df: df.assign(
                    value_x2=df["value"] * 2.0,
                    value_log=np.log1p(df["value"].fillna(0.0)),
                ),
            ),
        ]
    )
    return s


def test_odfv_applied_at_retrieval(store):
    entity_df = pd.DataFrame(
        {"user_id": [1, 2, 3], "event_timestamp": pd.to_datetime(["2024-01-20"] * 3)}
    )
    out = store.get_historical_features(entity_df, ["value_scaled:value_x2"]).to_pandas()
    assert "value_x2" in out.columns and "value_log" in out.columns
    mask = out["value"].notna()
    np.testing.assert_allclose(
        out.loc[mask, "value_x2"], out.loc[mask, "value"] * 2.0
    )


def test_entity_mapping_same_source_two_keys(tmp_path, sf_small, duck):
    """The origin/destination pattern: one physical table joined under
    two different join keys via field_mapping — two logical views over
    the same source (reference join_key_map,
    test_universal_historical_retrieval.py:66-77)."""
    s = Store(str(tmp_path / "repo"), sf_small)
    # view A: events keyed by user_id as-is; view B: same table with
    # user_id remapped to a different logical key name
    s.apply(
        [
            View(
                name="by_user",
                source=TableSource(name="events", table="events", timestamp_field="ts"),
                entities=[Entity("user", "user_id")],
                features=["value"],
            ),
            View(
                name="by_actor",
                source=TableSource(
                    name="events2",
                    table="events",
                    timestamp_field="ts",
                    field_mapping={"user_id": "actor_id", "value": "actor_value"},
                ),
                entities=[Entity("actor", "actor_id")],
                features=["actor_value"],
            ),
        ]
    )
    entity_df = pd.DataFrame(
        {
            "user_id": [1, 2],
            "actor_id": [2, 1],
            "event_timestamp": pd.to_datetime(["2024-01-20", "2024-01-20"]),
        }
    )
    out = (
        s.get_historical_features(entity_df, ["by_user:value", "by_actor:actor_value"])
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # row(user=1, actor=2): value = latest for 1, actor_value = latest for 2
    exp = duck.execute(
        """select user_id, value from (
             select user_id, value, row_number() over
               (partition by user_id order by ts desc) rn
             from events where ts <= timestamp '2024-01-20') where rn = 1
           order by user_id"""
    ).fetchdf()
    lookup = dict(zip(exp.user_id, exp.value))
    assert out.loc[0, "value"] == pytest.approx(lookup[1])
    assert out.loc[0, "actor_value"] == pytest.approx(lookup[2])
    assert out.loc[1, "value"] == pytest.approx(lookup[2])
    assert out.loc[1, "actor_value"] == pytest.approx(lookup[1])


def test_sql_transform_view(tmp_path, sf_small):
    """SQL transformation mode on a View (reference
    transformation/sql_transformation.py): the SQL runs per batch and
    feeds the normal compile chain."""
    from datetime import timedelta

    from feast_ray.store import Store
    from feast_ray.views import Entity, TableSource, View

    s = Store(str(tmp_path / "repo"), sf_small)
    v = View(
        name="ev_sql",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        sql="select user_id, ts, value * 2 as value2 from batch",
        features=["value2"],
        ttl=timedelta(days=30),
    )
    s.apply([v])
    out = s.build_view_ds(v).to_pandas()
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    assert len(out) == len(ev)
    assert set(out.columns) == {"user_id", "ts", "value2"}
    got = out.sort_values(["user_id", "ts"]).reset_index(drop=True)["value2"]
    exp = (ev.sort_values(["user_id", "ts"]).reset_index(drop=True)["value"] * 2)
    assert (got.to_numpy() == exp.to_numpy()).all()


def test_import_class_and_string_udf(tmp_path, sf_small):
    """Dotted-path plugin loading (reference import_class convention):
    a view whose udf is a string resolves at compile time; bad paths
    fail loudly."""
    import pytest as _pytest

    from feast_ray.plugins import import_class
    from feast_ray.store import Store
    from feast_ray.views import Entity, TableSource, View

    cls = import_class("feast_ray.functions.langid:LangIdModel")
    assert cls.__name__ == "LangIdModel"
    assert import_class("feast_ray.functions.langid.LangIdModel") is cls
    with _pytest.raises(ImportError):
        import_class("feast_ray.functions.langid:Nope")
    with _pytest.raises(ImportError):
        import_class("no.such.module:X")

    s = Store(str(tmp_path / "repo"), sf_small)
    v = View(
        name="docs_fp",
        source=TableSource(name="documents", table="documents"),
        entities=[Entity("doc", "doc_id")],
        udf="tests.test_odfv:_add_len_col",
        features=["text_len"],
    )
    s.apply([v])
    out = s.build_view_ds(v).to_pandas()
    assert (out["text_len"] > 0).all()


def _add_len_col(t):
    import pyarrow.compute as pc_

    return t.append_column("text_len", pc_.utf8_length(t["text"]))


def test_online_odfv(tmp_path, sf_small):
    """ODFVs apply at ONLINE retrieval too (reference
    feature_store.py:3622 transform path)."""
    from datetime import timedelta

    from feast_ray.store import Store
    from feast_ray.views import Entity, OnDemandView, TableSource, View

    s = Store(str(tmp_path / "repo"), sf_small)
    base = View(
        name="user_values",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        ttl=timedelta(days=30),
        features=["value"],
    )

    def _double(df):
        df = df.copy()
        df["value_x2"] = df["value"] * 2
        return df

    odfv = OnDemandView(
        name="doubled", udf=_double, sources=("user_values:value",),
        features=("value_x2",), mode="pandas",
    )
    s.apply([base, odfv])
    s.materialize()
    out = s.get_online_features(
        ["doubled:value_x2"], [{"user_id": 1}, {"user_id": 2}]
    )
    assert "value_x2" in out.columns
    assert (out["value_x2"].to_numpy() == out["value"].to_numpy() * 2).all()


def test_odfv_substrait_mode(tmp_path, sf_small):
    """mode="substrait": a serialized Substrait ExtendedExpression
    (the reference's third ODFV transformation kind) evaluated
    Arrow-native at retrieval — results identical to the equivalent
    pandas udf (VERDICT r2 missing #4)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.substrait as ps

    plan = bytes(
        ps.serialize_expressions(
            [pc.multiply(pc.field("value"), pa.scalar(2.0))],
            ["value_x2"],
            pa.schema([("value", pa.float64())]),
        )
    )
    s = Store(str(tmp_path / "repo"), sf_small)
    s.apply(
        [
            View(
                name="user_values",
                source=TableSource(name="events", table="events", timestamp_field="ts"),
                entities=[USER],
                ttl=timedelta(days=2),
                features=["value"],
            ),
            OnDemandView(
                name="value_scaled_sub",
                sources=("user_values:value",),
                features=("value_x2",),
                mode="substrait",
                substrait_plan=plan,
            ),
        ]
    )
    entity_df = pd.DataFrame(
        {"user_id": [1, 2, 3], "event_timestamp": pd.to_datetime(["2024-01-20"] * 3)}
    )
    out = s.get_historical_features(
        entity_df, ["user_values:value", "value_scaled_sub:value_x2"]
    ).to_pandas()
    assert np.allclose(out["value_x2"], out["value"] * 2.0, equal_nan=True)
    # online path applies the same plan
    s.materialize(views=["user_values"])
    on = s.get_online_features(
        ["user_values:value", "value_scaled_sub:value_x2"], [{"user_id": 1}]
    )
    assert np.allclose(on["value_x2"], on["value"] * 2.0, equal_nan=True)
