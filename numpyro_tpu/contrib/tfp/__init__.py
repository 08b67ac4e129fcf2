"""TensorFlow Probability bridges (reference: numpyro/contrib/tfp/).

tensorflow_probability is an optional dependency; importing these modules
without it raises a clear ImportError."""
