from .dispatcher import MODEL_ZOO, available_models, dispatch_model, get_model
from .fno import (FNO, FNO1d, FNO2d, FNO3d, TFNO, TFNO1d, TFNO2d, TFNO3d,
                  FNOBlocks)
from .layers import (AdaIN, ChannelMLP, GroupNorm, Lifting, Projection,
                     SkipConnection, SoftGating, instance_norm)
from .deeponet import DeepONetCartesianProd
from .dino import Decoder as DINoDecoder
from .dino import Derivative as DINoDerivative
from .dino import SetEncoder, SwishMLP, odeint_rk4
from .graph import GAT, GCN, GraphAttention, GraphConvolution
from .mfn import FourierNet, MFNFourierLayer, MultiplicativeNet
from .observers import FNO2dObserver, RNO2dObserver, UNet, make_grid
from .pino import (DenseNet, LowRank2d, PINObserver2d, PINObserverFullField,
                   PINOTrunk, PlanePredHead, PolicyModel2D, SpectralConvND)
from .rno import (RNO2d, RNOCell, RNOLayer, RNOSpectralConv2d,
                  SpectralConvWithFC, SpectralRegressor)
from .sfno import SFNO, SphericalConv
from .spectral_layers import SpectralConv
from .transformer import (BulkRegressor, FeedForward, FourierTransformer2D,
                          FourierTransformer2DLite, SimpleAttention,
                          SimpleTransformer, SimpleTransformerEncoderLayer,
                          attention, causal_linear_attention, freq_attention,
                          linear_attention, positional_encoding)
from .uno import UNO

__all__ = [
    "MODEL_ZOO", "available_models", "dispatch_model", "get_model",
    "FNO", "FNO1d", "FNO2d", "FNO3d", "TFNO", "TFNO1d", "TFNO2d", "TFNO3d",
    "FNOBlocks", "SpectralConv",
    "AdaIN", "ChannelMLP", "GroupNorm", "Lifting", "Projection",
    "SkipConnection", "SoftGating", "instance_norm",
    "FNO2dObserver", "RNO2dObserver", "UNet", "make_grid",
    "RNO2d", "RNOCell", "RNOLayer", "RNOSpectralConv2d",
    "SpectralConvWithFC", "SpectralRegressor",
    "FourierNet", "MFNFourierLayer", "MultiplicativeNet",
    "DenseNet", "LowRank2d", "PINObserver2d", "PINObserverFullField",
    "PINOTrunk", "PlanePredHead", "PolicyModel2D", "SpectralConvND",
    "BulkRegressor", "FeedForward", "FourierTransformer2D",
    "FourierTransformer2DLite", "SimpleAttention", "SimpleTransformer",
    "SimpleTransformerEncoderLayer", "attention", "causal_linear_attention",
    "freq_attention", "linear_attention", "positional_encoding", "UNO",
    "SFNO", "SphericalConv",
    "DeepONetCartesianProd", "DINoDecoder", "DINoDerivative", "SetEncoder",
    "SwishMLP", "odeint_rk4", "GAT", "GCN", "GraphAttention",
    "GraphConvolution",
]
