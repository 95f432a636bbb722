from feast_ray.pipelines.quality_filter import (
    quality_filter,
    quality_metrics,
    domain_of,
)

__all__ = ["quality_filter", "quality_metrics", "domain_of"]
