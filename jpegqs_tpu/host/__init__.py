from .jpegio import (JpegCoefFile, JpegImage, ComponentData, read_coefficients,
                     encode_pixels, decode_pixels, JCS_YCBCR, DCTSIZE, DCTSIZE2)
