#!/bin/bash
B=/tmp/classes_before
A=/root/repo/target/scala-2.13/classes
# --- sf32x wave ---
SPARK_GRAFT_SRP_TRANSIT=f64 /tmp/leg.sh $A /tmp/sf32x 1 32 "32x-pairs-f64  " sim_pairs_threshold_scaled
/tmp/leg.sh $A /tmp/sf32x 1 128 "32x-hneg-after " emb_hard_negatives
/tmp/leg.sh $B /tmp/sf32x 1 128 "32x-hneg-before" emb_hard_negatives
/tmp/leg.sh $A /tmp/sf32x 1 128 "32x-ann-after  " sim_ann_lsh_scaled
SPARK_GRAFT_SRP_TRANSIT=f64 /tmp/leg.sh $A /tmp/sf32x 1 128 "32x-ann-f64    " sim_ann_lsh_scaled
/tmp/leg.sh $B /tmp/sf32x 1 128 "32x-ann-before " sim_ann_lsh_scaled
echo SCALE32_DONE
# --- sf64x wave (third decade, PARTS=256) ---
/tmp/leg.sh $B /tmp/sf64x 1 256 "64x-pairs-before" sim_pairs_threshold_scaled
/tmp/leg.sh $A /tmp/sf64x 1 256 "64x-pairs-after " sim_pairs_threshold_scaled
SPARK_GRAFT_SRP_TRANSIT=f64 /tmp/leg.sh $A /tmp/sf64x 1 256 "64x-pairs-f64   " sim_pairs_threshold_scaled
/tmp/leg.sh $A /tmp/sf64x 1 256 "64x-hneg-after  " emb_hard_negatives
/tmp/leg.sh $A /tmp/sf64x 0 256 "64x-ann-after   " sim_ann_lsh_scaled
echo SCALE64_DONE
