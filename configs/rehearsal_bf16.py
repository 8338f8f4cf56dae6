# Flagship-dimension rehearsal with bfloat16 compute towers (float16=True,
# like FrameLaff_NoFrameFc_StrongCLIP_adjust) — exercises the host-side
# bf16 feature transfer path at scale.
from configs import rehearsal


class config(rehearsal.config):
    float16 = True
