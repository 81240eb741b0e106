from .model_config import HeroConfig, TransformerConfig, tiny_hero_config
from .shapes import BucketShape, tiny_bucket

__all__ = ["HeroConfig", "TransformerConfig", "tiny_hero_config",
           "BucketShape", "tiny_bucket"]
