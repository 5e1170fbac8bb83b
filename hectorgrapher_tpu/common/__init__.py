from hectorgrapher_tpu.common import time as time
from hectorgrapher_tpu.common import math as math
