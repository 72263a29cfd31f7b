from .generator import VoxelGNNGenerator
from .discriminator import VoxelGNNDiscriminator
from .layers import CONV_REGISTRY, GATConv, GATv2Conv, GCNConv, GraphConv, GraphNorm, HourglassGNN, MLPBlock, get_conv
from .grid_models import GridVoxelGNNGenerator, GridVoxelGNNDiscriminator
from .grid_layers import GRID_CONV_REGISTRY, GridHourglass, GridGraphNorm, grid_type_matched_pooling
from .transformer import GridTransformerGenerator, GridSelfAttention, TransformerBlock
