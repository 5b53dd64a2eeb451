"""Standalone torch oracle for the ModelScope UNet3DConditionModel.

diffusers is not installed in this environment, so this re-derives the block
math the reference composes (reference model_scope/unet_3d_condition.py:55-470
wiring; block internals per the diffusers modules it imports at
model_scope/unet_3d_blocks.py:19-21 — ResnetBlock2D, TemporalConvLayer,
Transformer2DModel, TransformerTemporalModel, Down/Upsample2D) as plain torch
modules whose state_dict keys match the diffusers checkpoint layout, so
io/torch_import.import_ms_unet_params consumes the oracle's state dict
unchanged.

Scope-limited to the configuration the MS T2V model actually uses:
- use_linear_projection=True (get_down_block/get_up_block defaults,
  unet_3d_blocks.py:170,226): all transformer proj_in/out are Linear
- temporal transformers double-self-attend (attn2 has no cross weights);
  the reference's 3D blocks call them without encoder states
- time_embedding_norm="default", output_scale_factor=1.0, eval-mode dropout

This is test-support code: the oracle exists to pin the flax rebuild's
numerics (models/unet_ms.py) and the importer's key/layout mapping.
"""

import math

import torch
from torch import nn
import torch.nn.functional as F


class Timesteps(nn.Module):
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0):
    cos|sin sinusoid."""

    def __init__(self, num_channels):
        super().__init__()
        self.num_channels = num_channels

    def forward(self, t):
        half = self.num_channels // 2
        exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
        freqs = torch.exp(exponent / half)
        args = t.float()[:, None] * freqs[None, :]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        if cond_proj_dim is not None:
            self.cond_proj = nn.Linear(cond_proj_dim, in_channels, bias=False)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        return self.linear_2(F.silu(self.linear_1(sample)))


class Attention(nn.Module):
    """diffusers Attention: no-bias qkv, to_out = [Linear, Dropout]."""

    def __init__(self, query_dim, heads, dim_head, cross_attention_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.dim_head = dim_head
        kv_dim = cross_attention_dim or query_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(kv_dim, inner, bias=False)
        self.to_v = nn.Linear(kv_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])

    def forward(self, x, encoder_hidden_states=None):
        ctx = x if encoder_hidden_states is None else encoder_hidden_states
        b, sq, _ = x.shape
        q = self.to_q(x).reshape(b, sq, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).reshape(b, -1, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, -1, self.heads, self.dim_head).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.dim_head**-0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, sq, -1)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [GEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    """norm1->attn1(self) -> norm2->attn2(cross or self) -> norm3->ff,
    pre-LN residuals."""

    def __init__(self, dim, heads, dim_head, cross_attention_dim=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, cross_attention_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, encoder_hidden_states=None):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), encoder_hidden_states) + x
        return self.ff(self.norm3(x)) + x


class Transformer2DModel(nn.Module):
    """Continuous-input spatial transformer, use_linear_projection=True."""

    def __init__(self, heads, dim_head, in_channels, cross_attention_dim,
                 norm_num_groups=32):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head, cross_attention_dim)]
        )
        self.proj_out = nn.Linear(inner, in_channels)

    def forward(self, x, encoder_hidden_states=None):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        for block in self.transformer_blocks:
            x = block(x, encoder_hidden_states)
        x = self.proj_out(x)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + residual


class TransformerTemporalModel(nn.Module):
    """Attention over frames per spatial position. GroupNorm runs on the
    (B, C, T, H, W) tensor — statistics span the whole clip. attn2 is a
    second self-attention (double_self_attention; the 3D blocks never pass
    encoder states to it)."""

    def __init__(self, heads, dim_head, in_channels, norm_num_groups=32):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head)]
        )
        self.proj_out = nn.Linear(inner, in_channels)

    def forward(self, x, num_frames=1):
        bt, c, h, w = x.shape
        b = bt // num_frames
        residual = x
        x = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
        x = self.norm(x)
        x = x.permute(0, 3, 4, 2, 1).reshape(b * h * w, num_frames, c)
        x = self.proj_in(x)
        for block in self.transformer_blocks:
            x = block(x)
        x = self.proj_out(x)
        x = x.reshape(b, h, w, num_frames, c).permute(0, 3, 4, 1, 2)
        return x.reshape(bt, c, h, w) + residual


class TemporalConvLayer(nn.Module):
    """Four GN->SiLU->(Dropout)->Conv3d((3,1,1)) stacks, identity residual."""

    def __init__(self, dim, dropout=0.1):
        super().__init__()
        conv3d = lambda: nn.Conv3d(dim, dim, (3, 1, 1), padding=(1, 0, 0))
        self.conv1 = nn.Sequential(nn.GroupNorm(32, dim), nn.SiLU(), conv3d())
        self.conv2 = nn.Sequential(
            nn.GroupNorm(32, dim), nn.SiLU(), nn.Dropout(dropout), conv3d()
        )
        self.conv3 = nn.Sequential(
            nn.GroupNorm(32, dim), nn.SiLU(), nn.Dropout(dropout), conv3d()
        )
        self.conv4 = nn.Sequential(
            nn.GroupNorm(32, dim), nn.SiLU(), nn.Dropout(dropout), conv3d()
        )

    def forward(self, x, num_frames=1):
        bt, c, h, w = x.shape
        x = x.reshape(bt // num_frames, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
        identity = x
        for conv in (self.conv1, self.conv2, self.conv3, self.conv4):
            x = conv(x)
        x = identity + x
        return x.permute(0, 2, 1, 3, 4).reshape(bt, c, h, w)


class ResnetBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, eps=1e-5,
                 groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1)
            if in_channels != out_channels
            else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Downsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _DownBlock(nn.Module):
    """CrossAttnDownBlock3D / DownBlock3D (unet_3d_blocks.py:423-653):
    per layer resnet -> temp_conv -> [attn -> temp_attn]."""

    def __init__(self, in_ch, out_ch, temb_ch, num_layers, head_dim, cross_dim,
                 cross_attention, add_downsample, eps):
        super().__init__()
        self.cross_attention = cross_attention
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, temb_ch, eps)
                for i in range(num_layers)
            ]
        )
        self.temp_convs = nn.ModuleList(
            [TemporalConvLayer(out_ch) for _ in range(num_layers)]
        )
        if cross_attention:
            heads = out_ch // head_dim
            self.attentions = nn.ModuleList(
                [
                    Transformer2DModel(heads, head_dim, out_ch, cross_dim)
                    for _ in range(num_layers)
                ]
            )
            self.temp_attentions = nn.ModuleList(
                [
                    TransformerTemporalModel(heads, head_dim, out_ch)
                    for _ in range(num_layers)
                ]
            )
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_ch)]) if add_downsample else None
        )

    def forward(self, x, temb, ctx, num_frames):
        states = ()
        for i, (resnet, temp_conv) in enumerate(zip(self.resnets, self.temp_convs)):
            x = resnet(x, temb)
            x = temp_conv(x, num_frames=num_frames)
            if self.cross_attention:
                x = self.attentions[i](x, ctx)
                x = self.temp_attentions[i](x, num_frames=num_frames)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class _UpBlock(nn.Module):
    """CrossAttnUpBlock3D / UpBlock3D (unet_3d_blocks.py:656-876)."""

    def __init__(self, in_ch, out_ch, prev_ch, temb_ch, num_layers, head_dim,
                 cross_dim, cross_attention, add_upsample, eps):
        super().__init__()
        self.cross_attention = cross_attention
        resnets = []
        for i in range(num_layers):
            skip_ch = in_ch if i == num_layers - 1 else out_ch
            res_in = prev_ch if i == 0 else out_ch
            resnets.append(ResnetBlock2D(res_in + skip_ch, out_ch, temb_ch, eps))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(
            [TemporalConvLayer(out_ch) for _ in range(num_layers)]
        )
        if cross_attention:
            heads = out_ch // head_dim
            self.attentions = nn.ModuleList(
                [
                    Transformer2DModel(heads, head_dim, out_ch, cross_dim)
                    for _ in range(num_layers)
                ]
            )
            self.temp_attentions = nn.ModuleList(
                [
                    TransformerTemporalModel(heads, head_dim, out_ch)
                    for _ in range(num_layers)
                ]
            )
        self.upsamplers = (
            nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None
        )

    def forward(self, x, skips, temb, ctx, num_frames):
        for i, (resnet, temp_conv) in enumerate(zip(self.resnets, self.temp_convs)):
            x = torch.cat([x, skips[-1]], dim=1)
            skips = skips[:-1]
            x = resnet(x, temb)
            x = temp_conv(x, num_frames=num_frames)
            if self.cross_attention:
                x = self.attentions[i](x, ctx)
                x = self.temp_attentions[i](x, num_frames=num_frames)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x, skips


class _MidBlock(nn.Module):
    """UNetMidBlock3DCrossAttn (unet_3d_blocks.py:268-420): resnet/temp_conv,
    then attn -> temp_attn -> resnet -> temp_conv."""

    def __init__(self, ch, temb_ch, head_dim, cross_dim, eps):
        super().__init__()
        heads = ch // head_dim
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_ch, eps) for _ in range(2)]
        )
        self.temp_convs = nn.ModuleList([TemporalConvLayer(ch) for _ in range(2)])
        self.attentions = nn.ModuleList(
            [Transformer2DModel(heads, head_dim, ch, cross_dim)]
        )
        self.temp_attentions = nn.ModuleList(
            [TransformerTemporalModel(heads, head_dim, ch)]
        )

    def forward(self, x, temb, ctx, num_frames):
        x = self.resnets[0](x, temb)
        x = self.temp_convs[0](x, num_frames=num_frames)
        x = self.attentions[0](x, ctx)
        x = self.temp_attentions[0](x, num_frames=num_frames)
        x = self.resnets[1](x, temb)
        x = self.temp_convs[1](x, num_frames=num_frames)
        return x


class MSUNetOracle(nn.Module):
    """Reference UNet3DConditionModel wiring (unet_3d_condition.py:329-470).

    sample: (B, C, T, H, W); encoder_hidden_states: (B, L, cross_dim);
    state_dict keys match the diffusers text-to-video-ms checkpoint layout.
    """

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(32, 64), layers_per_block=1,
                 attention_head_dim=8, cross_attention_dim=16,
                 time_cond_proj_dim=None, norm_eps=1e-5):
        super().__init__()
        ch0 = block_out_channels[0]
        temb_ch = ch0 * 4
        n = len(block_out_channels)
        self.conv_in = nn.Conv2d(in_channels, ch0, 3, padding=1)
        self.time_proj = Timesteps(ch0)
        self.time_embedding = TimestepEmbedding(ch0, temb_ch, time_cond_proj_dim)
        self.transformer_in = TransformerTemporalModel(8, attention_head_dim, ch0)

        self.down_blocks = nn.ModuleList()
        ch = ch0
        for i, out_ch in enumerate(block_out_channels):
            self.down_blocks.append(
                _DownBlock(
                    ch, out_ch, temb_ch, layers_per_block, attention_head_dim,
                    cross_attention_dim, cross_attention=i < n - 1,
                    add_downsample=i < n - 1, eps=norm_eps,
                )
            )
            ch = out_ch

        self.mid_block = _MidBlock(
            ch, temb_ch, attention_head_dim, cross_attention_dim, norm_eps
        )

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(block_out_channels))
        prev = rev[0]
        for i, out_ch in enumerate(rev):
            in_ch = rev[min(i + 1, n - 1)]
            self.up_blocks.append(
                _UpBlock(
                    in_ch, out_ch, prev, temb_ch, layers_per_block + 1,
                    attention_head_dim, cross_attention_dim,
                    cross_attention=i > 0, add_upsample=i < n - 1, eps=norm_eps,
                )
            )
            prev = out_ch

        self.conv_norm_out = nn.GroupNorm(32, ch0, eps=norm_eps)
        self.conv_out = nn.Conv2d(ch0, out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states,
                timestep_cond=None):
        b, _, num_frames, _, _ = sample.shape
        temb = self.time_embedding(self.time_proj(timesteps), timestep_cond)
        temb = temb.repeat_interleave(num_frames, dim=0)
        ctx = encoder_hidden_states.repeat_interleave(num_frames, dim=0)

        x = sample.permute(0, 2, 1, 3, 4).reshape(
            (b * num_frames, -1) + sample.shape[3:]
        )
        x = self.conv_in(x)
        x = self.transformer_in(x, num_frames=num_frames).contiguous()

        skips = (x,)
        for block in self.down_blocks:
            x, states = block(x, temb, ctx, num_frames)
            skips += states

        x = self.mid_block(x, temb, ctx, num_frames)

        for block in self.up_blocks:
            n_res = len(block.resnets)
            x, _ = block(x, skips[-n_res:], temb, ctx, num_frames)
            skips = skips[:-n_res]

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape((b, num_frames) + x.shape[1:]).permute(0, 2, 1, 3, 4)
