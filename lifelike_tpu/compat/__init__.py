from lifelike_tpu.compat import tleague_import  # noqa: F401
