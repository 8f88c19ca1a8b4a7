"""Version metadata (parity surface: reference src/__version__.py)."""

__version__ = "0.5.0"

VERSION_INFO = {
    "version": __version__,
    "name": "deepEMIA-TPU",
    "description": (
        "TPU-native deep-learning electron microscopy image analysis "
        "(JAX/XLA/Pallas re-design)"
    ),
}
