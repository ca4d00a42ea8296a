#!/bin/bash
# DIEN aux operating-point campaign (VERDICT r4 #3) — serialized TPU runs.
#   Stage A: mean-norm alpha curve at T=5  (one stream, r4 ALPHA_BASE protocol)
#   Stage B: mean-norm alpha curve at T=64 (one stream, r4 t64 protocol)
#   Stage C: interest-DRIFT generator at T=64, aux none vs paper(mean),
#            3 seeds — the setting built for the aux loss to help.
# Results land in /tmp/aux_*.json; merge + BASELINE happen in-session.
set -x
cd /root/repo

# Stage A — T=5 curve, mean norm (aux-none T=5 anchor exists in
# seq_signal_long.json aux_alpha_curve: 0.772).
for a in 0.02 0.1 0.5; do
  python tools/seq_signal.py --n 4000000 --test-n 500000 --epochs 20 \
    --datasets sequence --models dien --seeds 1 \
    --dien-aux paper --dien-aux-norm mean --dien-alpha $a \
    --json-out /tmp/auxA_mean_$a.json > /tmp/auxA_mean_$a.log 2>&1
done

# Stage B — T=64 curve, mean norm (aux-none T=64 12-ep anchor:
# 0.6875±0.0015, seq_signal_long.json t64_dien_aux_none).
for a in 0.02 0.1 0.5; do
  python tools/seq_signal.py --n 2000000 --test-n 300000 --epochs 12 \
    --t 64 --model-t 64 --recency 0.97 --datasets sequence --models dien \
    --seeds 1 --dien-aux paper --dien-aux-norm mean --dien-alpha $a \
    --json-out /tmp/auxB_mean_$a.json > /tmp/auxB_mean_$a.log 2>&1
done

# Stage C — drift generator, T=64: 3-seed aux-none vs paper(mean) at two
# alphas. din rides the none run for a non-recurrent context row.
python tools/seq_signal.py --n 1000000 --test-n 300000 --epochs 12 \
  --t 64 --model-t 64 --datasets drift --models din,dien --seeds 3 \
  --dien-aux none \
  --json-out /tmp/auxC_none.json > /tmp/auxC_none.log 2>&1
for a in 0.02 0.1; do
  python tools/seq_signal.py --n 1000000 --test-n 300000 --epochs 12 \
    --t 64 --model-t 64 --datasets drift --models dien --seeds 3 \
    --dien-aux paper --dien-aux-norm mean --dien-alpha $a \
    --json-out /tmp/auxC_mean_$a.json > /tmp/auxC_mean_$a.log 2>&1
done

echo DONE > /tmp/aux_campaign.done
