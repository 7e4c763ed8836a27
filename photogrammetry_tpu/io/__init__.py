from photogrammetry_tpu.io.ply import write_ply
from photogrammetry_tpu.io.image import read_image, write_image
from photogrammetry_tpu.io.draw import draw_squares, draw_lines, join_right
