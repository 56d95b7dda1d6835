from tpuseg.core import mesh, optim, prng, checkpoint  # noqa: F401
