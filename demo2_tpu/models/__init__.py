from .factory import make_model
from .demo import DeMo, DeMoLegacy, DeMoParallel
from .pife import PIFE
