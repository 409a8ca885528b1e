"""Samplers: batch-of-chains discrete MCMC drivers as jitted scan loops."""
