# Accuracy at the reference protocols (see workloads/accuracy.py for the
# asset list).  Examples:
#   make accuracy-deit CKPT=deit_tiny.pth DATA=/data/imagenet/val K=80
#   make accuracy-dit CKPT=DiT-XL-2-256x256.pt VAE=vae.pt \
#        REF=VIRTUAL_imagenet256_labeled.npz INCEPTION=pt_inception.pth N=10000
#   make accuracy-pixart CKPT=pixart.safetensors VAE=vae.pt \
#        EMBEDS=coco5k_t5.npz REF=coco_ref.npz INCEPTION=pt_inception.pth
PY ?= python
K ?= 80
N ?= 1000

accuracy-deit:
	$(PY) -m mx_quantization_tpu.workloads.accuracy deit \
	  $(if $(CKPT),--ckpt $(CKPT)) $(if $(DATA),--data $(DATA)) --k $(K)

accuracy-dit:
	$(PY) -m mx_quantization_tpu.workloads.accuracy dit \
	  $(if $(CKPT),--ckpt $(CKPT)) $(if $(VAE),--vae $(VAE)) \
	  $(if $(REF),--ref $(REF)) $(if $(INCEPTION),--inception $(INCEPTION)) \
	  --num-samples $(N)

accuracy-pixart:
	$(PY) -m mx_quantization_tpu.workloads.accuracy pixart \
	  $(if $(CKPT),--ckpt $(CKPT)) $(if $(VAE),--vae $(VAE)) \
	  --prompt-embeds $(EMBEDS) \
	  $(if $(REF),--ref $(REF)) $(if $(INCEPTION),--inception $(INCEPTION)) \
	  $(if $(CLIP),--clip $(CLIP))

# End-task metrics at toy scale, zero external assets (round 5):
# tier-vs-tier FID (DiT-S/2) and top-1 (DeiT-tiny).  Run on the TPU.
endtask-dit:
	$(PY) tools/train_debug_dit.py
	$(PY) tools/endtask_metrics.py dit

endtask-deit:
	$(PY) tools/endtask_metrics.py deit

test-fast:
	$(PY) -m pytest tests/ -m "not slow" -q

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py
.PHONY: accuracy-deit accuracy-dit accuracy-pixart test test-fast bench \
	endtask-dit endtask-deit
