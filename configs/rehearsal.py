# Flagship-dimension rehearsal config for synthetic at-scale runs:
# real LAFF-ml dims (common 4096, 8 heads, gru 1024/we 500, 4 video feats)
# over synthetic feature names.
from laff_tpu.configs import base_config as BaseConfig


class config(BaseConfig.config):
    model_name = 'LAFF'
    vid_feats = ['clip_ft', 'timesformer', 'x3d', 'ircsn']
    vis_fc_layers = ['0', 4096]
    txt_fc_layers = '0-4096'
    text_encoding = {
        'bow_encoding': {'name': 'bow_nsw'},
        'w2v_encoding': {'name': 'w2v_nsw'},
        'rnn_encoding': {'name': 'gru_mean'},
        'bert_encoding': {'name': 'noBert'},
        'CLIP_encoding': {'name': 'noCLIP'},
        'NetVLAD_encoding': {'name': 'noNetVLAD'},
    }
    threshold = 5
    we_dim = 500
    rnn_size = 1024
    batch_norm = True
    dropout = 0.2
    optimizer = 'adam'
    lr = 1e-4
    multi_head_attention = {'dropout': 0.0, 'heads': 8, 'embed_dim_qkv': 512}
    attention_param_each_head = {'with_ave': False, 'mul': False, 'split_head': True}
    txt_attention = BaseConfig.ATTENTION_TYPES[12]
    vis_attention = BaseConfig.ATTENTION_TYPES[12]
    w2v_dir = 'word2vec/synth500'
    eval_batch_size = 512
