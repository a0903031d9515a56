"""msmctts_tpu: TPU-native JAX/XLA rebuild of MSMC-TTS (hhguo/MSMC-TTS)."""

__version__ = "0.1.0"
