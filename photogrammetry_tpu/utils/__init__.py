from photogrammetry_tpu.utils.padding import PaddedPoints, pad_to, round_up
