from gansynth_tpu.synth.sampler import Sampler, make_sampler  # noqa: F401
