from .generator import VoxelGNNGenerator
from .discriminator import VoxelGNNDiscriminator
from .layers import CONV_REGISTRY, GATConv, GATv2Conv, GCNConv, GraphConv, GraphNorm, HourglassGNN, MLPBlock, get_conv
