"""MNIST-domain samplers over binary images ([N, 2*784]: x1 fixed, x2 evolves)."""
