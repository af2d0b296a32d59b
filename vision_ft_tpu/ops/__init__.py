from .attention import AttentionImplementation, scaled_dot_product_attention

__all__ = ["AttentionImplementation", "scaled_dot_product_attention"]
