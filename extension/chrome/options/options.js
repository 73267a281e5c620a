// Options page logic: persist {endpoint, enabled} in chrome.storage.sync;
// the service worker (js/worker.js) and content script read them live.

const DEFAULTS = { endpoint: "http://127.0.0.1:8086", enabled: true };

async function restore() {
  const stored = await chrome.storage.sync.get(DEFAULTS);
  document.getElementById("endpoint").value = stored.endpoint;
  document.getElementById("enabled").checked = stored.enabled;
}

async function save() {
  let endpoint = document.getElementById("endpoint").value.trim() || DEFAULTS.endpoint;
  endpoint = endpoint.replace(/\/+$/, "");
  const enabled = document.getElementById("enabled").checked;
  await chrome.storage.sync.set({ endpoint, enabled });
  const status = document.getElementById("status");
  status.textContent = "saved";
  setTimeout(() => (status.textContent = ""), 1200);
}

document.addEventListener("DOMContentLoaded", restore);
document.getElementById("save").addEventListener("click", save);
