"""Cross-framework parity utilities (PyTorch reference interop)."""
