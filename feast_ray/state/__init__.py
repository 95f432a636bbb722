from feast_ray.state.registry import Registry, materialize_resumable

__all__ = ["Registry", "materialize_resumable"]
