"""Reference-shaped synthetic checkpoint builder (tiny geometry).

Emits a state dict with EXACTLY the key/shape schema of the reference
VSTGNet checkpoint (/root/reference/vgqa/models/grounding_net.py module
tree as serialized by torch.save) at the tiny test geometry
(resnet_test width 8 / video_swin_test / 2-layer RoBERTa). Used by the
converter tests and by ``tools/parity_run.py --dry-run`` to prove the
convert -> save -> evaluate chain end-to-end before real assets exist.
"""

from __future__ import annotations

import numpy as np


def build_reference_state_dict(d=32, heads=4, ffn=64, enc=2, dec=2,
                                app=5, mot=7, text_d=32, text_ffn=64,
                                text_layers=2, vocab=128, max_pos=66):
    rng = np.random.RandomState(0)
    sd = {}

    def w(name, *shape):
        sd[name] = (rng.randn(*shape) * 0.02).astype(np.float32)

    def dense(p, i, o):
        w(f"{p}.weight", o, i)
        w(f"{p}.bias", o)

    def ln(p, n):
        sd[f"{p}.weight"] = np.ones(n, np.float32)
        w(f"{p}.bias", n)

    def bn(p, n):
        sd[f"{p}.weight"] = np.ones(n, np.float32) + 0.1
        w(f"{p}.bias", n)
        w(f"{p}.running_mean", n)
        sd[f"{p}.running_var"] = np.ones(n, np.float32)

    def mha(p, dim):
        w(f"{p}.in_proj_weight", 3 * dim, dim)
        w(f"{p}.in_proj_bias", 3 * dim)
        dense(f"{p}.out_proj", dim, dim)

    def mlp(p, dims):
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            dense(f"{p}.layers.{i}", a, b)

    # -- resnet_test (width 8, depths 1,1,1,1) ------------------------------
    width = 8
    pre = "vis_encoder.0.body"
    w(f"{pre}.conv1.weight", width, 3, 7, 7)
    bn(f"{pre}.bn1", width)
    inp = width
    for s in range(4):
        planes = width * 2**s
        p = f"{pre}.layer{s + 1}.0"
        w(f"{p}.conv1.weight", planes, inp, 1, 1)
        bn(f"{p}.bn1", planes)
        w(f"{p}.conv2.weight", planes, planes, 3, 3)
        bn(f"{p}.bn2", planes)
        w(f"{p}.conv3.weight", 4 * planes, planes, 1, 1)
        bn(f"{p}.bn3", 4 * planes)
        w(f"{p}.downsample.0.weight", 4 * planes, inp, 1, 1)
        bn(f"{p}.downsample.1", 4 * planes)
        inp = 4 * planes
    res_out = inp  # 256

    # -- video swin tiny ----------------------------------------------------
    C = 8
    window = (2, 2, 2)
    tbl = 27
    sw_heads = (2, 2, 2, 2)
    w("vid.patch_embed.proj.weight", C, 3, 2, 4, 4)
    w("vid.patch_embed.proj.bias", C)
    ln("vid.patch_embed.norm", C)
    for s in range(4):
        dim = C * 2**s
        p = f"vid.layers.{s}.blocks.0"
        ln(f"{p}.norm1", dim)
        w(f"{p}.attn.relative_position_bias_table", tbl, sw_heads[s])
        dense(f"{p}.attn.qkv", dim, 3 * dim)
        dense(f"{p}.attn.proj", dim, dim)
        ln(f"{p}.norm2", dim)
        dense(f"{p}.mlp.fc1", dim, 4 * dim)
        dense(f"{p}.mlp.fc2", 4 * dim, dim)
        if s < 3:
            ln(f"vid.layers.{s}.downsample.norm", 4 * dim)
            w(f"vid.layers.{s}.downsample.reduction.weight", 2 * dim, 4 * dim)
    swin_out = C * 8  # 64

    # -- roberta tiny --------------------------------------------------------
    pre = "text_encoder.body"
    w(f"{pre}.embeddings.word_embeddings.weight", vocab, text_d)
    w(f"{pre}.embeddings.position_embeddings.weight", max_pos, text_d)
    w(f"{pre}.embeddings.token_type_embeddings.weight", 1, text_d)
    ln(f"{pre}.embeddings.LayerNorm", text_d)
    for i in range(text_layers):
        p = f"{pre}.encoder.layer.{i}"
        dense(f"{p}.attention.self.query", text_d, text_d)
        dense(f"{p}.attention.self.key", text_d, text_d)
        dense(f"{p}.attention.self.value", text_d, text_d)
        dense(f"{p}.attention.output.dense", text_d, text_d)
        ln(f"{p}.attention.output.LayerNorm", text_d)
        dense(f"{p}.intermediate.dense", text_d, text_ffn)
        dense(f"{p}.output.dense", text_ffn, text_d)
        ln(f"{p}.output.LayerNorm", text_d)
    dense(f"{pre}.pooler.dense", text_d, text_d)
    dense("text_encoder.resizer.fc", text_d, d)
    ln("text_encoder.resizer.layer_norm", d)

    # -- projections ---------------------------------------------------------
    w("input_proj.weight", d, res_out, 1, 1)
    w("input_proj.bias", d)
    w("input_proj2.weight", d, swin_out, 1, 1)
    w("input_proj2.bias", d)

    # -- cross-modal encoder -------------------------------------------------
    for i in range(enc):
        p = f"ground_encoder.encoder.spatial_layers.{i}"
        mha(f"{p}.self_attn", d)
        dense(f"{p}.linear1", d, ffn)
        dense(f"{p}.linear2", ffn, d)
        ln(f"{p}.norm1", d)
        ln(f"{p}.norm2", d)
    ln("ground_encoder.encoder.norm", d)

    # -- classifier heads ----------------------------------------------------
    for name, vocab_sz in (("s_temporal_clas", 1), ("t_temporal_clas", 1),
                           ("s_spatial_clas", app), ("t_spatial_clas", mot)):
        for i in range(2):
            p = f"{name}.layer_ca.{i}"
            dense(f"{p}.attention.self.query", d, d)
            dense(f"{p}.attention.self.key", d, d)
            dense(f"{p}.attention.self.value", d, d)
            dense(f"{p}.attention.output.dense", d, d)
            ln(f"{p}.attention.output.LayerNorm", d)
            dense(f"{p}.hidden_intermediate.dense", d, d)
            dense(f"{p}.output.dense", d, d)
            ln(f"{p}.output.LayerNorm", d)
        dense(f"{name}.head.transform.dense", d, d)
        ln(f"{name}.head.transform.LayerNorm", d)
        w(f"{name}.head.decoder.weight", vocab_sz, d)
        w(f"{name}.head.bias", vocab_sz)

    # -- decoders ------------------------------------------------------------
    for i in range(dec):
        p = f"ground_decoder.time_decoder.layers.{i}"
        mha(f"{p}.self_attn", d)
        mha(f"{p}.cross_attn_image", d)
        dense(f"{p}.linear1", d, ffn)
        dense(f"{p}.linear2", ffn, d)
        ln(f"{p}.norm1", d)
        ln(f"{p}.norm3", d)
        ln(f"{p}.norm4", d)
    ln("ground_decoder.time_decoder.norm", d)

    for i in range(dec):
        p = f"ground_decoder.decoder.layers.{i}"
        for proj in ("sa_qcontent_proj", "sa_qtime_proj", "sa_qpos_proj",
                     "sa_kcontent_proj", "sa_ktime_proj", "sa_kpos_proj",
                     "sa_v_proj", "ca_qcontent_proj", "ca_kcontent_proj",
                     "ca_kpos_proj", "ca_v_proj", "ca_qpos_sine_proj"):
            dense(f"{p}.{proj}", d, d)
        if i == 0:
            dense(f"{p}.ca_qpos_proj", d, d)
        mha(f"{p}.self_attn", d)
        dense(f"{p}.cross_attn.out_proj", d, d)
        dense(f"{p}.linear1", d, ffn)
        dense(f"{p}.linear2", ffn, d)
        ln(f"{p}.norm1", d)
        ln(f"{p}.norm3", d)
        ln(f"{p}.norm4", d)
    mlp("ground_decoder.decoder.query_scale", (d, d, d))
    # box sine embedding is hardcoded 128-dim/coord (model_utils.py:18):
    # ref_point_head input is 512 regardless of d_model
    mlp("ground_decoder.decoder.ref_point_head", (512, d, d))
    mlp("ground_decoder.decoder.bbox_embed", (d, d, d, 4))
    ln("ground_decoder.pos_fc.0", d)
    dense("ground_decoder.pos_fc.2", d, 4)
    ln("ground_decoder.pos_fc.4", 4)
    ln("ground_decoder.time_fc.0", d)
    dense("ground_decoder.time_fc.2", d, d)
    ln("ground_decoder.time_fc.4", d)

    mlp("temp_embed", (d, d, 2))
    mlp("action_embed", (d, d, 1))
    return sd
