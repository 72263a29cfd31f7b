from . import segment
from .gumbel import gumbel_softmax_st
from .message_passing import gat_aggregate_xla
from .pooling import type_matched_pooling
from . import stencil
