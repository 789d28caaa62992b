"""Model layer: GP regression / classification on the spectral basis."""
