"""TPU compute ops: attention (XLA + Pallas), sampling."""
