from iron_tpu.shading.fresnel import smith_g1, ggx_ndf, fresnel_dielectric, fresnel_conductor_exact
from iron_tpu.shading.tables import mts_trans_table, mts_diff_trans_table, lookup_T12, lookup_Fdr
from iron_tpu.shading.brdf import (ggx_colocated, rough_plastic_colocated,
                                   smooth_dielectric, thin_dielectric,
                                   smooth_conductor_colocated, rough_conductor_colocated,
                                   mixture_colocated, composite_colocated,
                                   CONDUCTOR_IOR_850NM)
