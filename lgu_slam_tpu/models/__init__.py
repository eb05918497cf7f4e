"""Learned modules: encoders, correlation, Gaussian masks, KAN-GRU update."""
