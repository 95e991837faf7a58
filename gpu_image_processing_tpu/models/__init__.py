from .filters import BoxBlur, GaussianBlur, SobelEdgeDetection, get_filter  # noqa: F401
