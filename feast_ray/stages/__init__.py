from feast_ray.stages.transform import transform
from feast_ray.stages.filters import filter_mask, ttl_filter
from feast_ray.stages.dedup import keep_latest
from feast_ray.stages.aggregate import AggSpec, grouped_agg, windowed_agg
from feast_ray.stages.join import broadcast_join, asof_join, hash_join, cross_join
from feast_ray.stages.relational import distinct, topk, union_align
from feast_ray.stages.validate import validate_stage

__all__ = [
    "transform",
    "filter_mask",
    "ttl_filter",
    "keep_latest",
    "AggSpec",
    "grouped_agg",
    "windowed_agg",
    "broadcast_join",
    "asof_join",
    "hash_join",
    "cross_join",
    "distinct",
    "topk",
    "union_align",
    "validate_stage",
]
