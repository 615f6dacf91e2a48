from .mesh import proving_mesh
from .sharded_msm import sharded_msm
from .sharded_ntt import sharded_ntt
