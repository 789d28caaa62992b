"""Inference stack: EB optimization, PG Gibbs, HMC/NUTS, SVI, SMC."""
