from etch_tpu.models.etch_net import EtchNet  # noqa: F401
