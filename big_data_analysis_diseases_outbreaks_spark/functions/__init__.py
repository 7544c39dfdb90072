from .scalar import nan_repair, safe_div, sanitize_kw

__all__ = ["nan_repair", "safe_div", "sanitize_kw"]
