# Tear the fleet down — analog of cloud/examples/terminate_all.sh.
terraform -chdir=.. destroy -auto-approve
