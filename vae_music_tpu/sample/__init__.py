from vae_music_tpu.sample.decode import make_decode_fn, SampleMode
from vae_music_tpu.sample.export import export_chain, load_chain
from vae_music_tpu.sample.sampler import AncestralSampler
