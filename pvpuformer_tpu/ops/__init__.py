from .distmaps import disk_maps, dist_maps
from .ppue import ppue_click, ppue_box, ppue_scribble, PPuEConfig
from .edt import squared_edt, next_click_from_error
from .resize import (bilinear_resize, bilinear_matrix, resize_axis_matrices,
                     roi_crop_resize, roi_paste_back, bicubic_resize_numpy)
